"""Separate transport costs from device time on the warm bucketed path.

Four measurements on one matrix:
  fence_tiny   — device_fence on a tiny resident array (pure transport)
  percall_f    — warm spgemm_bucketed, device_fence every call (CLI protocol)
  percall_b    — warm fused dispatch, block_until_ready every call
  pipelined_N  — N back-to-back fused dispatches, ONE final device_fence;
                 per-iter = (total - fence_tiny) / N  (the cudaEvent
                 analogue: on-device steady-state time, transport excluded)

Usage: python scripts/probe_warm.py scircuit [N]
"""
import sys
sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp

from mh_spgemm_tpu.io import suites
from mh_spgemm_tpu.config import SpGEMMConfig
from mh_spgemm_tpu.ops import bucketed as bk
from mh_spgemm_tpu.pipeline import prepare_bucketed_state, spgemm_bucketed
from mh_spgemm_tpu.timing import Timing, device_fence


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "scircuit"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    config = SpGEMMConfig(mode="bucketed", value_dtype="float64")
    A = suites.load_matrix(name)

    # warm everything: plan, capacities, compile
    C, state = spgemm_bucketed(A, A, config=config)
    C, state = spgemm_bucketed(A, A, config=config, state=state)
    device_fence(C.val)
    plan = state.plan
    print(f"== {name}: nnz_c={plan.nnz_c} "
          f"classes={len(plan.classes)}")

    tiny = jnp.zeros((8,), jnp.int32) + 1
    device_fence(tiny)
    t0 = time.perf_counter()
    for _ in range(5):
        device_fence(tiny)
    fence_tiny = (time.perf_counter() - t0) / 5 * 1e3
    print(f"   fence_tiny (device_fence, resident array) {fence_tiny:8.2f} ms")

    def fused():
        return bk.run_bucketed_fused(
            plan, state.a_val, state.b_col, state.b_val, state.b_pairs,
            vdtype=config.vdtype, interpret=False, df=state.df,
            tail="off", b_words=state.b_words, wk=state.wk)

    # per-call, device_fence each call (what the CLI/driver measure)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        C, state = spgemm_bucketed(A, A, config=config, state=state,
                                   timing=Timing())
        best = min(best, time.perf_counter() - t0)
    print(f"   percall spgemm_bucketed + device_fence    {best*1e3:8.2f} ms")

    # per-call, block_until_ready each call
    out = fused()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fused()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"   percall fused + block_until_ready         {best*1e3:8.2f} ms")

    # pipelined: N dispatches, one fence
    for reps in (N, 2 * N):
        t0 = time.perf_counter()
        outs = [fused() for _ in range(reps)]
        device_fence(outs[-1][2])
        tot = (time.perf_counter() - t0) * 1e3
        per = (tot - fence_tiny) / reps
        print(f"   pipelined x{reps:<3d} total {tot:8.1f} ms  "
              f"-> per-iter {per:8.2f} ms")


if __name__ == "__main__":
    main()
