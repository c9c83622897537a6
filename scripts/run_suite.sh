#!/usr/bin/env bash
# Batch runner — reference process.sh equivalent: run the benchmark CLI over
# a list of matrices, abort on failure.
#   ./scripts/run_suite.sh [list_file] [extra args...]
# list_file: one matrix name or .mtx path per line (default: 16-matrix suite)
set -euo pipefail
cd "$(dirname "$0")/.."

LIST="${1:-}"
shift || true

if [[ -z "$LIST" ]]; then
    python -m mh_spgemm_tpu --suite "$@"
else
    while IFS= read -r name; do
        [[ -z "$name" || "$name" == \#* ]] && continue
        echo "=== $name ==="
        python -m mh_spgemm_tpu "$name" "$@"
    done < "$LIST"
fi
