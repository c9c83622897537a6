"""Headline benchmark: SpGEMM GFLOPS on the 16-matrix suite protocol.

Prints ONE JSON line per completed state (the last line is the most
complete; headline keys metric/value/unit/vs_baseline are placed at the
END of the object so a tail-truncated capture still carries them):

  {"detail": {...}, ..., "metric": "spgemm_gflops_geomean_16",
   "value": N, "unit": "GFLOPS", "vs_baseline": N}

* value        — geometric-mean GFLOPS of the TPU pipeline over the suite
                 (reference protocol: 2*intprod / total_ms, mask build
                 excluded — src/main.cu:136, src/Timing.cpp:39-42).
* vs_baseline  — ratio against the CPU oracle (scipy float64 SpGEMM) run
                 under the same protocol on this host; the reference repo
                 publishes no numbers of its own (BASELINE.md), so the
                 generated CPU-oracle baseline is the comparison point.

Robustness contract (round-3 driver bench died rc=124 with NO output —
16 fresh-process matrices x 2 remote-tunnel compiles at ~70-80 s each):

* single process, matrices sequential, cheapest first — the axon relay
  serves one client at a time and a killed client poisons it for minutes;
* the capacity cache (mh_spgemm_tpu/bench/plan_cache.py, committed under
  data/plan_cache/) warms each plan so only the fused program compiles;
* the oracle-time cache (data/oracle_ms.json + ~/.cache) makes the scipy
  baseline free on re-runs;
* a wall-clock deadline (BENCH_DEADLINE_S, default 1500 s) stops starting
  new matrices in time to print; SIGTERM/SIGINT also flush the summary.

Set BENCH_MATRICES=name1,name2 to subset; BENCH_ITERS to change iteration
count; SUITESPARSE_ROOT to use real SuiteSparse files instead of the
synthetic stand-ins.
"""

import gc
import json
import math
import os
import signal
import sys
import time

_ORACLE_HOME = os.path.join(os.path.expanduser("~"), ".cache",
                            "mh_spgemm_tpu", "oracle_ms.json")
_ORACLE_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "oracle_ms.json")

# Suite order: cheapest total cost first so partial runs bank the most
# matrices (compile dominates and is roughly constant; engine+oracle time
# orders the rest).
_ORDER = [
    "scircuit", "mac_econ_fwd500", "GAP-road", "pdb1HYS", "webbase-1M",
    "wb-edu", "cage12", "rma10", "offshore", "cant", "pwtk", "cop20k_A",
    "delaunay_n24", "shipsec1", "hood", "cage15",
]


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _load_json(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _oracle_ms_cached(name: str, A, B) -> float:
    """Oracle (scipy CPU) time, cached on disk — the baseline measurement
    is deterministic per matrix, and the big suite members take minutes.
    Lookup: repo-committed cache, then home cache, then compute+store."""
    key = f"{name}:{A.M}:{A.nnz}:{B.nnz}"
    if not os.environ.get("BENCH_ORACLE_FRESH"):
        for path in (_ORACLE_REPO, _ORACLE_HOME):
            cache = _load_json(path)
            if key in cache:
                return cache[key]
    from mh_spgemm_tpu.baseline import timed_oracle_spgemm
    _log(f"{name}: computing scipy oracle (uncached)")
    _, ms = timed_oracle_spgemm(A, B)
    for path in (_ORACLE_REPO, _ORACLE_HOME):
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            cache = _load_json(path)
            cache[key] = ms
            with open(path, "w") as f:
                json.dump(cache, f, indent=0, sort_keys=True)
        except OSError:
            continue
    return ms


def run_one(name: str, iters: int, mode: str, dtype: str) -> dict:
    """One matrix through the protocol, with plan-cache warming."""
    from mh_spgemm_tpu import SpGEMMConfig, gflops
    from mh_spgemm_tpu.bench import plan_cache
    from mh_spgemm_tpu.bench.driver import run_matrix
    from mh_spgemm_tpu.io import suites
    from mh_spgemm_tpu.pipeline import (choose_engine,
                                        prepare_blockdense_state,
                                        prepare_bucketed_state)

    config = SpGEMMConfig(mode=mode, value_dtype=dtype)
    A = suites.load_matrix(name)
    engine = choose_engine(A, A, config) if mode == "auto" else mode
    state, cache_hit = None, False
    if engine in ("bucketed", "blockdense"):
        prep = (prepare_bucketed_state if engine == "bucketed"
                else prepare_blockdense_state)
        state = prep(A, A, config)
        cache_hit = plan_cache.try_warm(state, name, A, engine, config)
        _log(f"{name}: engine={engine} plan_cache="
             f"{'hit' if cache_hit else 'miss'}")
    res = run_matrix(A, name, config, iters=iters, warmup=2,
                     check=False, verbose=False, mode=engine, state=state)
    if state is not None and not cache_hit and res.gflops > 0:
        saved = plan_cache.save(state, name, A, engine, config)
        if saved:
            _log(f"{name}: plan cache saved -> {saved}")
    oracle_ms = _oracle_ms_cached(name, A, A)  # suite: C = A @ A
    out = {
        "gflops": round(res.gflops, 3),
        "oracle_gflops": round(gflops(res.intprod, oracle_ms), 3),
        "nnz_c": res.nnz_c,
        "nnzc_per_s": round(res.nnzc_per_s, 1),
        "total_ms": round(res.timing.total(), 3),
        "oracle_ms": round(oracle_ms, 3),
        "engine": engine,
    }
    del res, state, A
    gc.collect()
    return out


def _summary(per_matrix: dict, skipped: list, mode: str, dtype: str,
             final: bool) -> str:
    ours = [v["gflops"] for v in per_matrix.values()
            if v.get("gflops", 0) > 0]
    base = [max(v["oracle_gflops"], 1e-12) for v in per_matrix.values()
            if v.get("gflops", 0) > 0]
    geo = (math.exp(sum(math.log(x) for x in ours) / len(ours))
           if ours else 0.0)
    geo_base = (math.exp(sum(math.log(x) for x in base) / len(base))
                if base else 1.0)
    # headline keys LAST: a tail-truncated capture keeps them
    return json.dumps({
        "detail": per_matrix,
        "skipped": skipped,
        "partial": bool(skipped) or not final,
        "baseline": "scipy-f64-cpu-oracle, same protocol, this host",
        "note": ("synthetic structural stand-ins; set SUITESPARSE_ROOT "
                 "for real matrices"),
        "mode": mode, "dtype": dtype,
        "n_matrices": len(ours),
        "metric": "spgemm_gflops_geomean_16",
        "value": round(geo, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(geo / geo_base, 3) if ours else 0.0,
    })


def main() -> int:
    import mh_spgemm_tpu  # noqa: F401  (enables x64)

    names = os.environ.get("BENCH_MATRICES")
    names = (names.split(",") if names
             else [n for n in _ORDER])
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    mode = os.environ.get("BENCH_MODE", "auto")
    dtype = os.environ.get("BENCH_DTYPE", "float64")
    deadline = _T0 + float(os.environ.get("BENCH_DEADLINE_S", "1500"))

    per_matrix, skipped = {}, list(names)
    stop = {"flag": False}

    def _on_signal(signum, frame):
        stop["flag"] = True
        _log(f"signal {signum}: flushing summary")
        print(_summary(per_matrix, skipped, mode, dtype, final=False),
              flush=True)

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_signal)

    costs = []  # completed per-matrix wall costs, for the skip estimate
    for name in names:
        remaining = deadline - time.monotonic()
        est = 1.3 * (sum(costs) / len(costs)) if costs else 240.0
        if stop["flag"] or remaining < min(est, 90.0):
            _log(f"deadline: skipping {name} (remaining {remaining:.0f}s, "
                 f"est {est:.0f}s)")
            continue
        t0 = time.monotonic()
        try:
            per_matrix[name] = run_one(name, iters, mode, dtype)
        except Exception as e:
            per_matrix[name] = {"error": f"{type(e).__name__}: {e}"}
            _log(f"{name}: FAILED {per_matrix[name]['error']}")
        costs.append(time.monotonic() - t0)
        skipped.remove(name)
        _log(f"{name}: done in {costs[-1]:.1f}s -> "
             f"{per_matrix[name].get('gflops', 'err')} GFLOPS")
        # stream the running summary: if we die later, the last complete
        # line still carries everything banked so far
        print(_summary(per_matrix, skipped, mode, dtype, final=False),
              flush=True)

    print(_summary(per_matrix, skipped, mode, dtype, final=True),
          flush=True)
    return 0 if per_matrix else 1


if __name__ == "__main__":
    sys.exit(main())
