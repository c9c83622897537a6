"""Structured 400-case soak — the reference's 408-matrix batch analogue
(process.sh over matrix408_list.txt) over the deterministic pathological
catalog (mh_spgemm_tpu.bench.structured), every engine vs the scipy
oracle.  Writes data/SOAK_STRUCTURED.json.

Run: JAX_PLATFORMS=cpu python scripts/soak_structured.py [--fast]
"""
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    fast = "--fast" in sys.argv
    import jax

    # the axon sitecustomize ignores JAX_PLATFORMS from the environment;
    # force CPU before the first backend query (repo workflow rule)
    jax.config.update("jax_platforms", "cpu")
    import mh_spgemm_tpu  # noqa: F401
    from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm, spgemm_host
    from mh_spgemm_tpu.bench import structured

    cases = structured.catalog()
    if fast:
        cases = cases[::10]
    engines = ("bucketed", "blockdense", "masked", "esc", "auto")
    t0 = time.time()
    fails = []
    per_family = {}
    for idx, (fam, i) in enumerate(cases):
        A, B = structured.make_case(fam, i)
        ref = oracle_spgemm(A, B)
        for mode in engines:
            try:
                C = spgemm_host(A, B if B is not A else None,
                                config=SpGEMMConfig(mode=mode))
                ok = C.equals(ref, tol=1e-9)
            except Exception as e:  # noqa: BLE001
                ok = False
                per_family.setdefault(fam, {}).setdefault("errors", []) \
                    .append(f"{i}/{mode}: {type(e).__name__}: {e}")
            if not ok:
                fails.append((fam, i, mode))
        per_family.setdefault(fam, {}).setdefault("n", 0)
        per_family[fam]["n"] += 1
        if (idx + 1) % 40 == 0:
            print(f"[{idx + 1}/{len(cases)}] fails={len(fails)} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    report = {
        "metric": "structured_soak",
        "cases": len(cases),
        "engines": list(engines),
        "runs": len(cases) * len(engines),
        "failures": [f"{f}/{i}/{m}" for f, i, m in fails],
        "per_family": {k: v.get("n", 0) for k, v in per_family.items()},
        "errors": {k: v["errors"] for k, v in per_family.items()
                   if "errors" in v},
        "seconds": round(time.time() - t0, 1),
    }
    with open("data/SOAK_STRUCTURED.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("cases", "runs", "seconds")}
                     | {"failures": len(fails)}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
