"""Benchmark driver — the reference CLI re-created (``src/main.cu:74-217``).

Protocol parity:

* intermediate-product count ``Sigma_i nnz(B[A.col[i]])`` computed on the
  host before any device work (src/main.cu:102-107),
* GFLOPS = ``2 * intprod / (total_ms * 1e6)`` with the mask build excluded
  from total time (src/main.cu:136, src/Timing.cpp:39-42),
* per-phase time breakdown, C.nnz print, optional oracle comparison
  (CHECK_RESULT) and CSV append (WRITE),
* failures are caught, reported, and scored 0 GFLOPS (src/main.cu:120-145).

On TPU a warm-up iteration triggers XLA compilation (the analogue of
``warm_gpu()`` + CUDA context creation); timed iterations then measure
steady-state execution including all host readbacks and device fences.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Optional

import numpy as np

from ..baseline import timed_oracle_spgemm
from ..config import SpGEMMConfig
from ..csr import CSR
from ..io.mmio import extract_matrix_name, read_mtx
from ..pipeline import make_plan, spgemm
from ..timing import Timing, gflops


@dataclasses.dataclass
class BenchResult:
    name: str
    m: int
    n: int
    nnz_a: int
    nnz_c: int
    intprod: int
    timing: Timing
    gflops: float
    nnzc_per_s: float
    ok: Optional[bool] = None          # oracle comparison, if run
    oracle_ms: Optional[float] = None
    oracle_gflops: Optional[float] = None
    stats: Optional[dict] = None       # engine occupancy counters
    torch_ms: Optional[float] = None   # torch-cpu vendor engine (--torch)
    torch_gflops: Optional[float] = None
    digest: Optional[dict] = None      # device result digest (baseline.py)

    def as_dict(self) -> dict:
        d = {
            "name": self.name, "M": self.m, "N": self.n,
            "nnz_A": self.nnz_a, "nnz_C": self.nnz_c,
            "intprod": self.intprod, "gflops": self.gflops,
            "nnzc_per_s": self.nnzc_per_s,
            "phases_ms": self.timing.as_dict(),
        }
        if self.ok is not None:
            d["check"] = "pass" if self.ok else "error"
        if self.oracle_gflops is not None:
            d["oracle_ms"] = self.oracle_ms
            d["oracle_gflops"] = self.oracle_gflops
        if self.torch_gflops is not None:
            d["torch_ms"] = self.torch_ms
            d["torch_gflops"] = self.torch_gflops
        if self.stats is not None:
            d["stats"] = self.stats
        return d


def run_matrix(A: CSR, name: str, config: SpGEMMConfig,
               iters: int = 3, warmup: int = 2,
               check: bool = False, verbose: bool = True,
               mode: Optional[str] = None,
               state=None, torch_baseline: bool = False,
               digest: bool = False) -> BenchResult:
    """Benchmark C = A @ B (B = A, or A^T under config.aat) on one matrix.

    ``mode``/``state`` let a caller that already chose the engine and
    prepared (possibly cache-warmed) state skip re-planning — bench.py
    uses this with the capacity cache (bench/plan_cache.py); ``state`` is
    mutated in place so the caller's reference stays current."""
    B = A.transpose() if (config.aat and not A.is_symmetric) else A
    intprod = A.intprod(B)  # host-side, like src/main.cu:102-107
    if verbose:
        print(f"Matrix {name} ({A.M} , {B.N}) nnz:{A.nnz}")
        print(f"SpGEMM intermediate result = {intprod}")

    C = None
    bench_timing = Timing()
    try:
        if mode is None:
            mode = config.mode
        if mode == "auto":
            from ..pipeline import choose_engine
            mode = choose_engine(A, B, config)
            if verbose:
                print(f"auto engine: {mode}")
        # Steady-state protocol: warm up, then dispatch all ``iters``
        # back-to-back with per-call fences suppressed, fence ONCE, and
        # subtract the measured transport round trip — the honest
        # analogue of the reference's cudaEvent loop (src/main.cu:102-
        # 137): on this environment's relay a per-iteration fence costs
        # ~32 ms of TUNNEL latency, which is synchronization price, not
        # device time.  ``--profile`` keeps per-phase fences instead.
        import time as _time

        from .. import pipeline as _pl
        from ..timing import device_fence, fence_round_trip_s
        pipelined = not config.profile
        if mode in ("bucketed", "blockdense", "masked"):
            from ..pipeline import (spgemm_blockdense, spgemm_bucketed,
                                    spgemm_masked)
            run = {"bucketed": spgemm_bucketed,
                   "blockdense": spgemm_blockdense,
                   "masked": spgemm_masked}[mode]

            def one(t):
                nonlocal C, state
                C, state = run(A, B, config=config, timing=t,
                               state=state)
        else:
            dA = A.device(config.vdtype, pad=True)
            dB = B.device(config.vdtype, pad=True) if B is not A else dA
            plan = make_plan(dA, dB)
            plan.intprod = intprod

            def one(t):
                nonlocal C
                C = spgemm(dA, dB, config=config, timing=t, plan=plan)

        for _ in range(warmup):
            one(Timing())
        if pipelined:
            device_fence(C.val)                  # drain before timing
            rtt = fence_round_trip_s()
            t0 = _time.perf_counter()
            with _pl.no_fence():
                for _ in range(iters):
                    t = Timing()
                    one(t)
                    bench_timing += t
            device_fence(C.val)
            total_ms = (_time.perf_counter() - t0 - rtt) * 1e3
            bench_timing /= max(1, iters)
            # phase fields now hold host-side dispatch time only; fold
            # the device remainder into numeric so total() equals the
            # measured steady-state per-iteration time
            bench_timing.numeric += max(
                0.0, total_ms / max(1, iters) - bench_timing.total())
        else:
            for _ in range(iters):
                t = Timing()
                one(t)
                bench_timing += t
            bench_timing /= max(1, iters)
    except Exception as e:  # reference prints "failed", scores 0 GFLOPS
        print(f"MH-SpGEMM-TPU failed!!! ({type(e).__name__}: {e})")
        return BenchResult(name=name, m=A.M, n=B.N, nnz_a=A.nnz, nnz_c=0,
                           intprod=intprod, timing=bench_timing, gflops=0.0,
                           nnzc_per_s=0.0, ok=False if check else None)

    nnz_c = C.nnz
    total_ms = bench_timing.total()
    gf = gflops(intprod, total_ms)
    nnzc_rate = nnz_c / (total_ms * 1e-3) if total_ms > 0 else 0.0
    if verbose:
        print(f"C.nnz = {nnz_c}")
        bench_timing.print_step_time()
        print(f"MH-SpGEMM-TPU runtime is {total_ms:.3f}ms, "
              f"Gflops is {gf:.2f}")

    res = BenchResult(name=name, m=A.M, n=B.N, nnz_a=A.nnz, nnz_c=nnz_c,
                      intprod=intprod, timing=bench_timing, gflops=gf,
                      nnzc_per_s=nnzc_rate)
    if mode in ("bucketed", "blockdense", "masked"):
        res.stats = state.plan.stats()
        # roofline-style audit: achieved cost per intermediate product vs
        # the measured per-element random-access floor (SURVEY.md §5.1's
        # per-kernel audit, aggregated per run)
        if intprod and total_ms > 0:
            res.stats["ns_per_product"] = round(
                total_ms * 1e6 / intprod, 2)
            # roofline bound per slot: ~4 ns with the Mosaic ragged fill
            # (run + step overheads at measured merge factors), ~5 ns on
            # the XLA takes path (re-measured 2026-08-20,
            # scripts/micro_gather2.py) — NOT the hardware DMA bound
            # (~0.06), which a fully fused engine could still chase
            any_fill = any(getattr(c, "fill", False)
                           for c in getattr(state.plan, "classes", []))
            res.stats["floor_ns_per_product"] = (
                4 if any_fill else 5) if mode != "blockdense" else None
    if digest:
        # same-run verification evidence without a full D2H: five scalars
        # (structure hash sums + weighted value sum) the bench compares
        # against the cached oracle digest (baseline.digest_device)
        from ..baseline import digest_device
        res.digest = digest_device(C)
    if check:
        C_ref, oracle_ms = timed_oracle_spgemm(A, B)
        res.oracle_ms = oracle_ms
        res.oracle_gflops = gflops(intprod, oracle_ms)
        res.ok = C.host().equals(C_ref, tol=config.tolerance, verbose=True)
        if verbose:
            print(f"oracle(scipy): {oracle_ms:.3f}ms, Gflops is "
                  f"{res.oracle_gflops:.2f}")
            print("pass" if res.ok else "error")
    if torch_baseline:
        # reference CUSPARSE flag: run the independent vendor engine,
        # time it under the same protocol, print its GFLOPS
        # (src/main.cu:148-173); values go through the scipy-aligned
        # oracle for the differential check since torch prunes exact
        # cancellations (baseline.torch_spgemm docstring)
        from ..baseline import torch_spgemm
        _, torch_ms = torch_spgemm(A, B)
        res.torch_ms = torch_ms
        res.torch_gflops = gflops(intprod, torch_ms)
        if verbose:
            print(f"torch-cpu: {torch_ms:.3f}ms, Gflops is "
                  f"{res.torch_gflops:.2f}")
    return res


def append_csv(path: str, value: float) -> None:
    """WRITE-flag CSV append (src/main.cu:202-212)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(f"{value:.2f}\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="mh-spgemm-tpu",
        description="TPU-native SpGEMM benchmark (reference CLI parity)")
    p.add_argument("matrix", nargs="?",
                   help=".mtx path or suite matrix name")
    p.add_argument("--suite", action="store_true",
                   help="run the 16-matrix suite")
    p.add_argument("--mode", default="auto",
                   choices=["auto", "bucketed", "blockdense", "masked",
                            "esc"])
    p.add_argument("--dtype", default="float64",
                   choices=["float64", "float32"])
    p.add_argument("--aat", action="store_true", help="C = A @ A^T")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--check", action="store_true",
                   help="verify against the scipy oracle (CHECK_RESULT)")
    p.add_argument("--write", metavar="CSV",
                   help="append GFLOPS to CSV (WRITE flag)")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line per matrix")
    p.add_argument("--torch", action="store_true",
                   help="also run+time torch-cpu sparse CSR matmul (the "
                        "CUSPARSE-flag analogue, src/main.cu:148-173)")
    p.add_argument("--stats", action="store_true",
                   help="print engine occupancy counters (the "
                        "HASH_CONFLICT-counter analogue)")
    p.add_argument("--profile", action="store_true",
                   help="fence every phase for exact attribution "
                        "(adds ~35 ms/fence on this transport)")
    args = p.parse_args(argv)

    tol = 1e-9 if args.dtype == "float64" else 1e-4
    config = SpGEMMConfig(mode=args.mode, value_dtype=args.dtype,
                          aat=args.aat, tolerance=tol,
                          profile=args.profile)

    from ..io import suites
    names = suites.SIXTEEN_MATRICES if args.suite else [args.matrix]
    if not names or names[0] is None:
        p.error("give a matrix path/name or --suite")

    rc = 0
    for name in names:
        print("-" * 26 + "SpGEMM Start!!!" + "-" * 26)
        try:
            if os.path.exists(name):
                A = read_mtx(name)
                label = extract_matrix_name(name)
            elif "/" in name or name.endswith(".mtx"):
                raise FileNotFoundError(f"no such matrix file: {name}")
            else:
                A = suites.load_matrix(name)
                label = name
            res = run_matrix(A, label, config, iters=args.iters,
                             check=args.check, verbose=not args.json,
                             torch_baseline=args.torch)
            if args.json:
                print(json.dumps(res.as_dict()))
            if args.stats and res.stats is not None:
                print("engine stats:", json.dumps(res.stats))
            if args.write:
                append_csv(args.write, res.gflops)
            if res.ok is False:
                rc = 1
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})")
            rc = 1
        print("-" * 26 + "SpGEMM   End!!!" + "-" * 26)
    return rc


if __name__ == "__main__":
    sys.exit(main())
