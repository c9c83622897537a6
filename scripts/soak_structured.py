"""Structured 400-case soak — the reference's 408-matrix batch analogue
(process.sh over matrix408_list.txt) over the deterministic pathological
catalog (mh_spgemm_tpu.bench.structured), every engine vs the scipy
oracle.  Writes data/SOAK_STRUCTURED.json.

Each family runs in its OWN subprocess: 2000 engine runs over hundreds
of distinct shapes grow the in-process XLA jit cache without bound (an
earlier single-process run died in LLVM with ENOMEM), so the parent
shards by family and merges the partial reports.

Run: python scripts/soak_structured.py [--fast] [--family NAME]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def run_family(fam: str, fast: bool, lo: int = 0, hi: int = 10**9) -> dict:
    """Child-process entry: run one slice of a family over all engines."""
    import jax

    # the axon sitecustomize ignores JAX_PLATFORMS from the environment;
    # force CPU before the first backend query (repo workflow rule)
    jax.config.update("jax_platforms", "cpu")
    import mh_spgemm_tpu  # noqa: F401
    from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm, spgemm_host
    from mh_spgemm_tpu.bench import structured

    count = min(structured.FAMILIES[fam][1], hi)
    idxs = range(lo, count, 10 if fast else 1)
    engines = ("bucketed", "blockdense", "masked", "esc", "auto")
    fails, errors, n = [], [], 0
    for i in idxs:
        A, B = structured.make_case(fam, i)
        ref = oracle_spgemm(A, B)
        for mode in engines:
            try:
                C = spgemm_host(A, B if B is not A else None,
                                config=SpGEMMConfig(mode=mode))
                ok = C.equals(ref, tol=1e-9)
            except Exception as e:  # noqa: BLE001
                ok = False
                errors.append(f"{i}/{mode}: {type(e).__name__}: {e}")
            if not ok:
                fails.append(f"{fam}/{i}/{mode}")
        n += 1
    return {"family": fam, "cases": n, "failures": fails,
            "errors": errors}


def main() -> int:
    if "--run-family" in sys.argv:
        i = sys.argv.index("--run-family")
        fam = sys.argv[i + 1]
        lo, hi = ((int(sys.argv[i + 2]), int(sys.argv[i + 3]))
                  if len(sys.argv) > i + 3 and sys.argv[i + 2].isdigit()
                  else (0, 10**9))
        out = run_family(fam, "--fast" in sys.argv, lo, hi)
        print("RESULT" + json.dumps(out))
        return 0

    from mh_spgemm_tpu.bench import structured  # light import, no jax use

    fast = "--fast" in sys.argv
    fams = ([sys.argv[sys.argv.index("--family") + 1]]
            if "--family" in sys.argv else list(structured.FAMILIES))
    from concurrent.futures import ThreadPoolExecutor

    from mh_spgemm_tpu.bench.structured import FAMILIES
    t0 = time.time()
    env = dict(os.environ, MHSPGEMM_COMPILE_CACHE=os.path.expanduser(
        "~/.cache/mh_spgemm_tpu/xla_cpu_soak"))
    SHARD = 10                  # cases per child: bounds the jit cache
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_shard(job):
        fam, lo = job
        cmd = [sys.executable, "scripts/soak_structured.py",
               "--run-family", fam, str(lo), str(lo + SHARD)] \
            + (["--fast"] if fast else [])
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=5400, cwd=root, env=env)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("RESULT")]
        except subprocess.TimeoutExpired:
            p, line = None, []
        if not line:
            return (fam, {"cases": 0, "failures": [
                f"{fam}/{lo}..{lo+SHARD}/crashed "
                f"rc={getattr(p, 'returncode', 'timeout')}"],
                "errors": ([p.stderr[-400:]] if p is not None else [])})
        got = json.loads(line[0][len("RESULT"):])
        print(f"{fam}[{lo}:{lo+SHARD}]: cases={got['cases']} "
              f"fails={len(got['failures'])} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return (fam, got)

    jobs = [(fam, lo) for fam in fams
            for lo in range(0, FAMILIES[fam][1], SHARD)]
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run_shard, jobs))
    parts = []
    for fam in fams:
        merged = {"family": fam, "cases": 0, "failures": [], "errors": []}
        for f, got in results:
            if f == fam:
                merged["cases"] += got["cases"]
                merged["failures"] += got["failures"]
                merged["errors"] += got["errors"]
        parts.append(merged)

    fails = [f for p_ in parts for f in p_["failures"]]
    report = {
        "metric": "structured_soak",
        "cases": sum(p_["cases"] for p_ in parts),
        "engines": ["bucketed", "blockdense", "masked", "esc", "auto"],
        "runs": sum(p_["cases"] for p_ in parts) * 5,
        "failures": fails,
        "per_family": {p_["family"]: p_["cases"] for p_ in parts},
        "errors": {p_["family"]: p_["errors"] for p_ in parts
                   if p_["errors"]},
        "seconds": round(time.time() - t0, 1),
    }
    with open("data/SOAK_STRUCTURED.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"cases": report["cases"], "runs": report["runs"],
                      "seconds": report["seconds"],
                      "failures": len(fails)}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
