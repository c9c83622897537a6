"""Headline benchmark: SpGEMM GFLOPS on the 16-matrix suite protocol.

Prints ONE JSON line:
  {"metric": "spgemm_gflops_geomean_16", "value": N, "unit": "GFLOPS",
   "vs_baseline": N, ...}

* value        — geometric-mean GFLOPS of the TPU pipeline over the suite
                 (reference protocol: 2*intprod / total_ms, mask build
                 excluded — src/main.cu:136, src/Timing.cpp:39-42).
* vs_baseline  — ratio against the CPU oracle (scipy float64 SpGEMM) run
                 under the same protocol on this host; the reference repo
                 publishes no numbers of its own (BASELINE.md), so the
                 generated CPU-oracle baseline is the comparison point.

Set BENCH_MATRICES=name1,name2 to subset; BENCH_ITERS to change iteration
count; SUITESPARSE_ROOT to use real SuiteSparse files instead of the
synthetic stand-ins.
"""

import json
import math
import os
import sys

_ORACLE_CACHE = os.path.join(os.path.expanduser("~"), ".cache",
                             "mh_spgemm_tpu", "oracle_ms.json")


def _oracle_ms_cached(name: str, A, B) -> float:
    """Oracle (scipy CPU) time, cached on disk — the baseline measurement
    is deterministic per matrix, and the big suite members take minutes."""
    from mh_spgemm_tpu.baseline import timed_oracle_spgemm
    key = f"{name}:{A.M}:{A.nnz}:{B.nnz}"
    cache = {}
    if os.path.exists(_ORACLE_CACHE):
        try:
            with open(_ORACLE_CACHE) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if key in cache and not os.environ.get("BENCH_ORACLE_FRESH"):
        return cache[key]
    _, ms = timed_oracle_spgemm(A, B)
    cache[key] = ms
    os.makedirs(os.path.dirname(_ORACLE_CACHE), exist_ok=True)
    with open(_ORACLE_CACHE, "w") as f:
        json.dump(cache, f)
    return ms


def run_one(name: str, iters: int, mode: str, dtype: str) -> dict:
    """One matrix through the protocol (runs inside a per-matrix
    subprocess: device buffers from earlier suite members otherwise
    linger through the relay and thrash HBM — shipsec1 measured 44 s
    in-process vs 0.27 s isolated; the persistent compile cache keeps
    the isolation nearly free)."""
    from mh_spgemm_tpu import SpGEMMConfig, gflops
    from mh_spgemm_tpu.bench.driver import run_matrix
    from mh_spgemm_tpu.io import suites

    config = SpGEMMConfig(mode=mode, value_dtype=dtype)
    A = suites.load_matrix(name)
    res = run_matrix(A, name, config, iters=iters, warmup=2,
                     check=False, verbose=False)
    oracle_ms = _oracle_ms_cached(name, A, A)  # suite: C = A @ A
    return {
        "gflops": round(res.gflops, 3),
        "oracle_gflops": round(gflops(res.intprod, oracle_ms), 3),
        "nnz_c": res.nnz_c,
        "nnzc_per_s": round(res.nnzc_per_s, 1),
        "total_ms": round(res.timing.total(), 3),
        "oracle_ms": round(oracle_ms, 3),
    }


def main() -> int:
    import subprocess
    import mh_spgemm_tpu  # noqa: F401  (enables x64)

    from mh_spgemm_tpu.io import suites

    names = os.environ.get("BENCH_MATRICES")
    names = (names.split(",") if names else suites.SIXTEEN_MATRICES)
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    mode = os.environ.get("BENCH_MODE", "auto")
    dtype = os.environ.get("BENCH_DTYPE", "float64")

    per_matrix = {}
    ours, base = [], []
    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        child = (f"import json, sys; sys.path.insert(0, {here!r}); "
                 f"import bench; print('RESULT ' + json.dumps("
                 f"bench.run_one({name!r}, {iters}, {mode!r}, "
                 f"{dtype!r})))")
        try:
            if os.environ.get("BENCH_INPROC"):
                per_matrix[name] = run_one(name, iters, mode, dtype)
            else:
                p = subprocess.run([sys.executable, "-c", child],
                                   capture_output=True, text=True,
                                   timeout=3600, cwd=here)
                line = next(ln for ln in p.stdout.splitlines()
                            if ln.startswith("RESULT "))
                per_matrix[name] = json.loads(line[len("RESULT "):])
            if per_matrix[name]["gflops"] > 0:
                ours.append(per_matrix[name]["gflops"])
                base.append(per_matrix[name]["oracle_gflops"])
        except StopIteration:  # scored as failure, like the reference
            per_matrix[name] = {"error": p.stderr[-300:]}
        except Exception as e:
            per_matrix[name] = {"error": f"{type(e).__name__}: {e}"}

    if not ours:
        print(json.dumps({"metric": "spgemm_gflops_geomean_16",
                          "value": 0.0, "unit": "GFLOPS",
                          "vs_baseline": 0.0, "detail": per_matrix}))
        return 1

    geo = math.exp(sum(math.log(x) for x in ours) / len(ours))
    geo_base = math.exp(sum(math.log(max(x, 1e-12)) for x in base)
                        / len(base))
    print(json.dumps({
        "metric": "spgemm_gflops_geomean_16",
        "value": round(geo, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(geo / geo_base, 3),
        "baseline": "scipy-f64-cpu-oracle, same protocol",
        "mode": mode, "dtype": dtype,
        "n_matrices": len(ours),
        "detail": per_matrix,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
