"""Real-chip A/B of the expansion-frontend/planner knobs on one matrix.

Round-4 shipped wide-gather + class merging tuned against a micro that
XLA's slice-fusion DCE had polluted (scripts/micro_gather2.py is the
corrected one); the round-4 bench then showed the short-span members
REGRESSING with no stats to say why (VERDICT round-4 weak #2).  This
script measures the variants end-to-end on the real chip, one process,
sequentially:

  takes     — wide_gather=off  (3 separate takes;  new default)
  wide      — wide_gather=on   (one 4-word slice gather per slot)
  nofill    — dma_fill=off     (everything on the gather path)
  nomerge   — MHSPGEMM_CLASS_MERGE_NS=0 (no class consolidation)

Usage: python scripts/ab_frontend.py scircuit [webbase-1M ...]
Prints one JSON line per (matrix, variant) with total_ms and stats.
"""
import json
import os
import sys

sys.path.insert(0, ".")


def run(name: str, label: str, env: dict, cfg_kw: dict) -> None:
    os.environ.update(env)  # MHSPGEMM_CLASS_MERGE_NS is read per plan call
    from mh_spgemm_tpu import SpGEMMConfig
    from mh_spgemm_tpu.bench.driver import run_matrix
    from mh_spgemm_tpu.io import suites

    A = suites.load_matrix(name)
    cfg = SpGEMMConfig(mode="bucketed", value_dtype="float64", **cfg_kw)
    res = run_matrix(A, name, cfg, iters=3, warmup=2, check=False,
                     verbose=False, mode="bucketed")
    out = {"matrix": name, "variant": label,
           "total_ms": round(res.timing.total(), 3),
           "gflops": round(res.gflops, 3)}
    if res.stats:
        out["ns_per_product"] = res.stats.get("ns_per_product")
        out["padding_ratio"] = res.stats.get("padding_ratio")
        out["classes"] = [
            (c["W"], c["rows"], c["frontend"]) for c in
            res.stats.get("classes", [])]
    print(json.dumps(out), flush=True)


VARIANTS = [
    ("takes", {}, {}),
    ("wide", {}, {"wide_gather": "on"}),
    ("nofill", {}, {"dma_fill": "off"}),
    ("nomerge", {"MHSPGEMM_CLASS_MERGE_NS": "0"}, {}),
]


def main():
    names = sys.argv[1:] or ["scircuit"]
    only = os.environ.get("AB_VARIANTS")
    for name in names:
        for label, env, kw in VARIANTS:
            if only and label not in only.split(","):
                continue
            try:
                run(name, label, env, kw)
            except Exception as e:
                print(json.dumps({"matrix": name, "variant": label,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            # reset env between variants
            os.environ.pop("MHSPGEMM_CLASS_MERGE_NS", None)


if __name__ == "__main__":
    main()
