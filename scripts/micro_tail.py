"""Honest A/B of the per-chunk ESC tail: XLA sort tail vs Mosaic
esc_tail, on representative (rows, W) shapes, pipelined timing (see
scripts/profile_bucketed.py — block_until_ready only acks the enqueue on
this transport).

Usage: python scripts/micro_tail.py
"""
import sys
sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp
import numpy as np

from mh_spgemm_tpu.ops import bucketed as bk
from mh_spgemm_tpu.ops import esc_tail as et

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


def _time(fn, *args, iters=10):
    out = fn(*args)
    _fetch1(out)
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch1(out)
    return max(0.0, time.perf_counter() - t0 - rtt) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    shapes = [(163840, 8), (8192, 16), (1792, 256), (320, 1024),
              (1024, 128)]
    for rows, W in shapes:
        slots = rows * W
        # ~25% duplicate columns, keys in [0, W): realistic dedup load
        K = rng.integers(0, max(1, 3 * W // 4), (rows, W)).astype(np.int32)
        # mask ~40% of slots invalid like padded plans
        mask = rng.random((rows, W)) < 0.6
        Km = np.where(mask, np.sort(K, axis=1), np.int32(2**31 - 1))
        H = rng.standard_normal((rows, W)).astype(np.float32)
        L = (rng.standard_normal((rows, W)) * 1e-8).astype(np.float32)
        jK = jnp.asarray(Km)
        jH = jnp.asarray(np.where(mask, H, 0))
        jL = jnp.asarray(np.where(mask, L, 0))
        sp = max(1, int(np.ceil(np.log2(W))))

        # iota-weighted sums: plain sums are permutation-invariant and
        # let XLA delete the sorts entirely (measured: 0.00 ms)
        wgt = jnp.arange(slots, dtype=jnp.float32).reshape(rows, W)

        @jax.jit
        def xla_tail(K, H, L):
            oC, oV, nnz = bk._chunk_tail(K, (H, L), rb=rows,
                                         seg_passes=sp, df=True, W=W)
            return (jnp.sum(oC * wgt).astype(jnp.float32)
                    + jnp.sum(oV * wgt)
                    + jnp.sum(nnz).astype(jnp.float32))

        t_x = _time(xla_tail, jK, jH, jL)

        bits = jax.lax.bitcast_convert_type

        @jax.jit
        def mosaic_tail(K, H, L):
            rl = jnp.full((rows,), np.int32(W))
            oK, oh, ol = et.esc_tail(K, bits(H, jnp.int32),
                                     bits(L, jnp.int32), rl, w2=W,
                                     f64=True)
            return (jnp.sum(oK * wgt).astype(jnp.float32)
                    + jnp.sum(bits(oh, jnp.float32) * wgt)
                    + jnp.sum(bits(ol, jnp.float32) * wgt))

        try:
            t_m = _time(mosaic_tail, jK, jH, jL)
        except Exception as e:
            t_m = float("nan")
            print(f"   mosaic failed: {type(e).__name__}: {e}")
        print(f"rows={rows:<7d} W={W:<5d} slots={slots:<9d} "
              f"xla {t_x:8.2f} ms ({t_x*1e6/slots:6.1f} ns/slot)   "
              f"mosaic {t_m:8.2f} ms ({t_m*1e6/slots:6.1f} ns/slot)",
              flush=True)


if __name__ == "__main__":
    main()
