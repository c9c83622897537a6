"""On-chip cost of the static routing network (ops/planned.proute) at
several widths/plane counts, min-of-N pipelined timing.

Usage: python scripts/micro_proute.py
"""
import sys
sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp
import numpy as np

from mh_spgemm_tpu.ops import planned as pn

_RTT = None


def _fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def _rtt():
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1)
        o = f(jnp.zeros((8,), jnp.int32))
        _fetch1(o)
        ts = []
        for _ in range(3):
            o = f(jnp.zeros((8,), jnp.int32))
            t0 = time.perf_counter()
            _fetch1(o)
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def _time(fn, *args, iters=30, reps=5):
    out = fn(*args)
    _fetch1(out)
    rtt = _rtt()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch1(out)
        best = min(best,
                   max(0.0, time.perf_counter() - t0 - rtt) / iters)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    for m, nplanes, hold in [(32768, 3, 1), (65536, 3, 1),
                             (262144, 3, 1), (65536, 2, 16)]:
        dest = rng.permutation(m).astype(np.int64)
        t0 = time.perf_counter()
        masks, nstages = pn.plan_route(dest, m)
        t_plan = time.perf_counter() - t0
        vals = [jnp.asarray(rng.integers(0, 1 << 30, m)
                            .astype(np.int32)) for _ in range(nplanes)]
        md = jnp.asarray(masks)
        flags = jnp.asarray((rng.random(m) < 0.3).astype(np.int32))

        def run(md, flags, *vals):
            return pn.proute(list(vals), md, nstages, hold_w2=hold,
                             flags=flags)
        t0 = time.perf_counter()
        out = run(md, flags, *vals)
        _fetch1(out)
        t_compile = time.perf_counter() - t0
        ref = np.zeros(m, np.int32)
        ref[dest] = np.asarray(vals[0])
        ok = (np.array_equal(np.asarray(out[0]), ref) if hold == 1
              else True)
        t = _time(run, md, flags, *vals)
        print(f"m={m:<7d} planes={nplanes} hold={hold:<3d} "
              f"stages={nstages:<4d} plan {t_plan*1e3:6.0f} ms  "
              f"compile {t_compile:5.1f} s  ok={ok}  "
              f"{t:7.3f} ms  {t*1e6/m:5.2f} ns/slot", flush=True)


if __name__ == "__main__":
    main()
