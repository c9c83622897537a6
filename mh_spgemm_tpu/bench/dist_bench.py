"""Distributed scaling benchmark — the 'scaling efficiency at N' metric
BASELINE.md mandates (the reference is single-GPU; this is new capability).

Runs row-partitioned SpGEMM at D = 1, 2, 4, ... devices on the same
matrix and reports strong-scaling efficiency  t(1) / (D * t(D)).  On real
hardware the mesh rides ICI/DCN; under the virtual CPU mesh (tests, CI)
the numbers validate the mechanism, not the speed.

Usage:  python -m mh_spgemm_tpu.bench.dist_bench [matrix] [--strategy S]
"""

from __future__ import annotations

import argparse
import json
import time

import jax


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mh-spgemm-tpu-dist")
    p.add_argument("matrix", nargs="?", default="scircuit")
    p.add_argument("--strategy", default="ragged",
                   choices=["replicate", "allgather", "ragged",
                            "ragged_overlap", "grid2d"])
    p.add_argument("--engine", default="bucketed",
                   choices=["bucketed", "esc"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--max-devices", type=int, default=None)
    args = p.parse_args(argv)

    import mh_spgemm_tpu  # noqa: F401
    from mh_spgemm_tpu import oracle_spgemm, verify
    from mh_spgemm_tpu.io import suites
    from mh_spgemm_tpu.parallel.mesh import make_grid_mesh, make_row_mesh
    from mh_spgemm_tpu.parallel.spgemm_dist import spgemm_dist
    from mh_spgemm_tpu.timing import device_fence  # noqa: F401

    ndev = len(jax.devices())
    if args.max_devices:
        ndev = min(ndev, args.max_devices)
    A = suites.load_matrix(args.matrix)
    ref = oracle_spgemm(A, A)

    results = {}
    t1 = None
    d = 1
    while d <= ndev:
        # grid2d needs a 2-D mesh: rows x 2 columns once D >= 4
        if args.strategy == "grid2d" and d < 4:
            d *= 2
            continue        # grid2d needs rows x cols with cols = 2
        mesh = (make_grid_mesh(d // 2, 2)
                if args.strategy == "grid2d" else make_row_mesh(d))
        st = {}
        C = spgemm_dist(A, None, mesh, b_strategy=args.strategy,
                        state=st, engine=args.engine)  # warm: plan+compile
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            C = spgemm_dist(A, None, mesh, b_strategy=args.strategy,
                            state=st, engine=args.engine)
            ts.append((time.perf_counter() - t0) * 1e3)
        ok = verify(C, ref, raise_on_fail=False, verbose=False)
        ms = min(ts)
        if d == 1:
            t1 = ms
        results[d] = {"ms": round(ms, 2),
                      "efficiency": (round(t1 / (d * ms), 3)
                                     if t1 else None),
                      "check": "pass" if ok else "error"}
        d *= 2

    print(json.dumps({
        "metric": "spgemm_dist_scaling",
        "matrix": args.matrix,
        "strategy": args.strategy,
        "engine": args.engine,
        "devices": results,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
