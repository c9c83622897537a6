"""Headline benchmark: SpGEMM GFLOPS on the 16-matrix suite protocol.

Prints ONE JSON line per completed state (the last line is the most
complete; headline keys metric/value/unit/vs_baseline are placed at the
END of the object so a tail-truncated capture still carries them), and
ALSO writes the full summary to data/BENCH_ROUND5.json after every
matrix — the driver's stdout tail-capture truncated round 4's record.

  {"detail": {...}, ..., "metric": "spgemm_gflops_geomean_16",
   "value": N, "unit": "GFLOPS", "vs_baseline": N}

* value        — geometric-mean GFLOPS of the TPU pipeline over the suite
                 (reference protocol: 2*intprod / total_ms, mask build
                 excluded — src/main.cu:136, src/Timing.cpp:39-42).
                 When the run is PARTIAL the metric is renamed
                 spgemm_gflops_geomean_partial: a subset geomean must
                 never wear the full-suite name (round-4 verdict).
* vs_baseline  — ratio against the CPU oracle (scipy float64 SpGEMM) run
                 under the same protocol on this host; the reference repo
                 publishes no numbers of its own (BASELINE.md), so the
                 generated CPU-oracle baseline is the comparison point.
* check        — per matrix, same-run verification: the engine result's
                 device-computed digest (exact structure hash + weighted
                 value sum, baseline.digest_device) against the cached
                 oracle digest.  The reference's CHECK_RESULT analogue
                 (src/main.cu:187-199) at tunnel-affordable cost.

Robustness contract (round-3 driver bench died rc=124 with NO output —
16 fresh-process matrices x 2 remote-tunnel compiles at ~70-80 s each):

* single process, matrices sequential, cheapest first — the axon relay
  serves one client at a time and a killed client poisons it for minutes;
* the capacity cache (mh_spgemm_tpu/bench/plan_cache.py, committed under
  data/plan_cache/) warms each plan so only the fused program compiles;
* the oracle-time + digest cache (data/oracle_digest.json + ~/.cache)
  makes the scipy baseline AND the verification free on re-runs;
* a wall-clock deadline (BENCH_DEADLINE_S, default 2100 s) stops starting
  new matrices in time to print; SIGTERM/SIGINT also flush the summary.

Set BENCH_MATRICES=name1,name2 to subset; BENCH_ITERS to change iteration
count; SUITESPARSE_ROOT to use real SuiteSparse files instead of the
synthetic stand-ins; BENCH_MASKED=0 to skip the masked-engine contract
entries (cant, pdb1HYS).
"""

import gc
import json
import math
import os
import signal
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
_ORACLE_HOME = os.path.join(os.path.expanduser("~"), ".cache",
                            "mh_spgemm_tpu", "oracle_digest.json")
_ORACLE_REPO = os.path.join(_REPO, "data", "oracle_digest.json")
_ORACLE_MS_LEGACY = os.path.join(_REPO, "data", "oracle_ms.json")
_OUT_JSON = os.path.join(_REPO, "data", "BENCH_ROUND5.json")

# Suite order: cheapest total cost first so partial runs bank the most
# matrices (compile dominates and is roughly constant; engine+oracle time
# orders the rest).
_ORDER = [
    "scircuit", "mac_econ_fwd500", "GAP-road", "pdb1HYS", "webbase-1M",
    "wb-edu", "cage12", "rma10", "offshore", "cant", "pwtk", "cop20k_A",
    "delaunay_n24", "shipsec1", "hood", "cage15",
]

# Masked-engine contract members (round-3 measured 1.28x bucketed on cant;
# the <=1.5x contract stays measured every round — round-4 verdict item 8)
_MASKED = ["cant", "pdb1HYS"]


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


def _store(path: str, key: str, entry) -> None:
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cache = _load_json(path)
        cache[key] = entry
        with open(path, "w") as f:
            json.dump(cache, f, indent=0, sort_keys=True)
    except OSError:
        pass


def _oracle_entry(name: str, A, B) -> dict:
    """Cached {ms, digest} of the scipy oracle for (name, A, B).  Lookup:
    repo cache, home cache, legacy ms-only cache (digest computed fresh),
    else compute both and store."""
    key = f"{name}:{A.M}:{A.nnz}:{B.nnz}"
    fresh = bool(os.environ.get("BENCH_ORACLE_FRESH"))
    entry = {}
    if not fresh:
        for path in (_ORACLE_REPO, _ORACLE_HOME):
            cached = _load_json(path).get(key)
            if isinstance(cached, dict) and "digest" in cached:
                return cached
            if isinstance(cached, dict) and not entry:
                entry = dict(cached)
        if "ms" not in entry:
            ms = _load_json(_ORACLE_MS_LEGACY).get(key)
            if ms is not None:
                entry["ms"] = ms
    from mh_spgemm_tpu.baseline import (digest_host, oracle_spgemm,
                                        timed_oracle_spgemm)
    if "ms" in entry:
        _log(f"{name}: oracle ms cached; computing digest once")
        C_ref = oracle_spgemm(A, B)
    else:
        _log(f"{name}: computing scipy oracle (uncached)")
        C_ref, ms = timed_oracle_spgemm(A, B)
        entry["ms"] = ms
    entry["digest"] = digest_host(C_ref)
    del C_ref
    gc.collect()
    for path in (_ORACLE_REPO, _ORACLE_HOME):
        _store(path, key, entry)
    return entry


def run_one(name: str, iters: int, mode: str, dtype: str) -> dict:
    """One matrix through the protocol, with plan-cache warming and
    same-run digest verification."""
    from mh_spgemm_tpu import SpGEMMConfig, gflops
    from mh_spgemm_tpu.baseline import digest_check
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
                     check=False, verbose=False, mode=engine, state=state,
                     digest=True)
    if state is not None and not cache_hit and res.gflops > 0:
        saved = plan_cache.save(state, name, A, engine, config)
        if saved:
            _log(f"{name}: plan cache saved -> {saved}")
    oracle = _oracle_entry(name, A, A)  # suite: C = A @ A
    oracle_ms = oracle["ms"]
    if res.digest is not None:
        ok, reason = digest_check(res.digest, oracle["digest"],
                                  tol=config.tolerance)
        check = "pass" if ok else f"error: {reason}"
    else:
        check = "error: no result digest"
    _log(f"{name}: check={check}")
    out = {
        "gflops": round(res.gflops, 3),
        "oracle_gflops": round(gflops(res.intprod, oracle_ms), 3),
        "nnz_c": res.nnz_c,
        "nnzc_per_s": round(res.nnzc_per_s, 1),
        "total_ms": round(res.timing.total(), 3),
        "oracle_ms": round(oracle_ms, 3),
        "engine": engine,
        "check": check,
    }
    if res.stats:
        out["stats"] = res.stats
    del res, state, A
    gc.collect()
    return out


def _summary(per_matrix: dict, skipped: list, masked: dict, mode: str,
             dtype: str, final: bool) -> str:
    ours = [v["gflops"] for v in per_matrix.values()
            if v.get("gflops", 0) > 0]
    base = [max(v["oracle_gflops"], 1e-12) for v in per_matrix.values()
            if v.get("gflops", 0) > 0]
    geo = (math.exp(sum(math.log(x) for x in ours) / len(ours))
           if ours else 0.0)
    geo_base = (math.exp(sum(math.log(x) for x in base) / len(base))
                if base else 1.0)
    partial = bool(skipped) or not final
    checks = [v.get("check") for v in per_matrix.values()]
    summary = {
        "detail": per_matrix,
        "skipped": skipped,
        "partial": partial,
        "verified": sum(1 for c in checks if c == "pass"),
        "check_failures": sorted(
            k for k, v in per_matrix.items()
            if v.get("check", "pass") != "pass"),
        "baseline": "scipy-f64-cpu-oracle, same protocol, this host",
        "note": ("synthetic structural stand-ins; set SUITESPARSE_ROOT "
                 "for real matrices"),
        "mode": mode, "dtype": dtype,
        "n_matrices": len(ours),
    }
    if masked:
        summary["masked"] = masked
    # headline keys LAST: a tail-truncated capture keeps them.  A subset
    # geomean never wears the full-suite metric name.
    summary.update({
        "metric": ("spgemm_gflops_geomean_16" if not partial
                   else "spgemm_gflops_geomean_partial"),
        "value": round(geo, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(geo / geo_base, 3) if ours else 0.0,
    })
    line = json.dumps(summary)
    try:
        os.makedirs(os.path.dirname(_OUT_JSON), exist_ok=True)
        with open(_OUT_JSON, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    return line


def _run_masked(masked: dict, iters: int, dtype: str) -> None:
    """Masked-engine contract entries (<=1.5x bucketed on the FEM pair)."""
    from mh_spgemm_tpu import SpGEMMConfig
    from mh_spgemm_tpu.bench.driver import run_matrix
    from mh_spgemm_tpu.io import suites
    for name in _MASKED:
        try:
            A = suites.load_matrix(name)
            cfg = SpGEMMConfig(mode="masked", value_dtype=dtype)
            res = run_matrix(A, name, cfg, iters=iters, warmup=2,
                             check=False, verbose=False, mode="masked")
            masked[name] = {"gflops": round(res.gflops, 3),
                            "total_ms": round(res.timing.total(), 3)}
            _log(f"masked {name}: {res.timing.total():.0f} ms")
            del A, res
            gc.collect()
        except Exception as e:
            masked[name] = {"error": f"{type(e).__name__}: {e}"}
            _log(f"masked {name}: FAILED {masked[name]['error']}")


def main() -> int:
    import mh_spgemm_tpu  # noqa: F401  (enables x64)

    names = os.environ.get("BENCH_MATRICES")
    names = (names.split(",") if names
             else [n for n in _ORDER])
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    mode = os.environ.get("BENCH_MODE", "auto")
    dtype = os.environ.get("BENCH_DTYPE", "float64")
    deadline = _T0 + float(os.environ.get("BENCH_DEADLINE_S", "2100"))
    want_masked = os.environ.get("BENCH_MASKED", "1") != "0"

    per_matrix, skipped, masked = {}, list(names), {}
    if os.environ.get("BENCH_MERGE", "1") != "0":
        # subset reruns (BENCH_MATRICES=...) update the round record in
        # place instead of clobbering the other members' entries
        prior = _load_json(_OUT_JSON)
        for k, v in (prior.get("detail") or {}).items():
            if k not in names:
                per_matrix[k] = v
        masked = dict(prior.get("masked") or {})
    stop = {"flag": False}

    def _on_signal(signum, frame):
        stop["flag"] = True
        _log(f"signal {signum}: flushing summary")
        print(_summary(per_matrix, skipped, masked, mode, dtype,
                       final=False), flush=True)

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
        print(_summary(per_matrix, skipped, masked, mode, dtype,
                       final=False), flush=True)

    if (want_masked and not stop["flag"]
            and deadline - time.monotonic() > 240.0):
        _run_masked(masked, iters, dtype)

    print(_summary(per_matrix, skipped, masked, mode, dtype, final=True),
          flush=True)
    return 0 if per_matrix else 1


if __name__ == "__main__":
    sys.exit(main())
