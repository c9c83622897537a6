"""Microbench: per-slot cost of the expansion gather variants on real TPU.

Question driving the round-4 frontend work: is XLA's gather cost on this
chip per-INDEX or per-BYTE?  If per-index, fetching all words of a B
nonzero with ONE [nnz, k]-operand row gather (slice (1, k)) should cost
the same as one word gather — i.e. the df32 path's three separate takes
(col, hi, lo at ~26 ns/slot combined) collapse to ~1/2-1/3 of that.

Timed with the chained-inside-one-jit protocol of scripts/micro2.py
(block_until_ready is unreliable through the axon relay).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

ITERS = 8
N_SRC = 1 << 20          # B nonzeros
S = 1 << 19              # slots gathered


def fetch_ms(fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


_LAT = None


def null_latency():
    global _LAT
    if _LAT is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8,), jnp.float32)
        _LAT = fetch_ms(f, x)
        print(f"null dispatch+fetch latency: {_LAT:.1f} ms", flush=True)
    return _LAT


def timed(make_step, init, label, slots):
    @jax.jit
    def chained(src, *data):
        acc = jnp.float32(0)
        for _ in range(ITERS):
            outs = make_step(src, *data)
            acc = acc + sum(jnp.sum(o[:1].astype(jnp.float32))
                            for o in outs)
            # data-dependence so XLA cannot hoist: perturb indices by a
            # value derived from the previous result (0 in practice)
            src = src + (acc.astype(jnp.int32) & 0)
        return acc

    total = fetch_ms(chained, *init)
    per_ms = (total - null_latency()) / ITERS
    print(f"{label:44s}: {per_ms:8.2f} ms  "
          f"{per_ms * 1e6 / slots:6.1f} ns/slot", flush=True)
    return per_ms


def main():
    rng = np.random.default_rng(0)
    src_h = rng.integers(0, N_SRC, size=S).astype(np.int32)
    src = jnp.asarray(src_h)
    col = jnp.asarray(rng.integers(0, 1 << 20, N_SRC).astype(np.int32))
    hi = jnp.asarray(rng.random(N_SRC, np.float32))
    lo = jnp.asarray(rng.random(N_SRC, np.float32))
    w4 = jnp.asarray(rng.integers(0, 1 << 20, (N_SRC, 4)).astype(np.int32))
    w2 = jnp.asarray(rng.integers(0, 1 << 20, (N_SRC, 2)).astype(np.int32))
    w8 = jnp.asarray(
        rng.integers(0, 1 << 20, (N_SRC, 8)).astype(np.int32))
    p64 = jnp.asarray(rng.integers(0, 1 << 60, N_SRC).astype(np.int64))

    timed(lambda s, c: (c[s],), (src, col), "1 take i32 (1 word)", S)
    timed(lambda s, c, h, l: (c[s], h[s], l[s]), (src, col, hi, lo),
          "3 takes i32 (df32 current, 3 words)", S)
    timed(lambda s, w: (w[s],), (src, w2), "1 take [nnz,2] i32 (2 words)",
          S)
    timed(lambda s, w: (w[s],), (src, w4), "1 take [nnz,4] i32 (4 words)",
          S)
    timed(lambda s, w: (w[s],), (src, w8), "1 take [nnz,8] i32 (8 words)",
          S)
    timed(lambda s, p: (p[s],), (src, p64), "1 take i64 (2 words)", S)
    # sorted indices: does locality help?
    ssrc = jnp.asarray(np.sort(src_h))
    timed(lambda s, w: (w[s],), (ssrc, w4), "1 take [nnz,4] sorted idx", S)

    # flat operand + slice_sizes=(k,): avoids any [N, k] minor-dim layout
    # padding; one index fetches k consecutive words
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    flat4 = jnp.asarray(
        rng.integers(0, 1 << 20, N_SRC * 16).astype(np.int32))

    def slice_gather(s, f, k):
        return (jax.lax.gather(
            f, (s * k)[:, None], dn, slice_sizes=(k,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS),)

    timed(lambda s, f: slice_gather(s, f, 4), (src, flat4),
          "lax.gather flat slice k=4", S)
    timed(lambda s, f: slice_gather(s, f, 2), (src, flat4),
          "lax.gather flat slice k=2", S)
    timed(lambda s, f: slice_gather(s, f, 8), (src, flat4),
          "lax.gather flat slice k=8", S)
    timed(lambda s, f: slice_gather(s, f, 16), (src, flat4),
          "lax.gather flat slice k=16", S)

    # scatter side (the _expand_seeds cost model): ne seed scatters into
    # an RW-sized chunk buffer — measured per scatter-index, and as the
    # 5-scatter seed group the expansion frontend actually performs
    RW = S
    ne = S // 2              # ~2 slots per entry (short-span class shape)
    dst_h = np.sort(rng.choice(RW, size=ne, replace=False)).astype(np.int32)
    dst = jnp.asarray(dst_h)
    vals = jnp.asarray(rng.integers(0, 1 << 20, ne).astype(np.int32))
    timed(lambda d, v: (jnp.zeros((RW,), jnp.int32)
                        .at[d].set(v, mode="drop"),),
          (dst, vals), f"1 scatter i32 ({ne} idx, sorted)", ne)
    timed(lambda d, v: tuple(jnp.zeros((RW,), jnp.int32)
                             .at[d].set(v + i, mode="drop")
                             for i in range(5)),
          (dst, vals), f"5 scatters i32 (seed group, {ne} idx)", ne)
    rows16 = jnp.asarray(
        rng.integers(0, 1 << 20, (ne, 16)).astype(np.int32))
    timed(lambda d, r: (jnp.zeros((RW, 16), jnp.int32)
                        .at[d].set(r, mode="drop"),),
          (dst, rows16), f"1 row scatter [ne,16] ({ne} idx)", ne)
    # cumsum over the chunk (the _slab_src / entry-id pattern)
    big = jnp.asarray(rng.integers(0, 3, RW).astype(np.int32))
    timed(lambda s, b: (jnp.cumsum(b + (s[:1] & 0)),), (src, big),
          f"cumsum i32 over {RW}", RW)


if __name__ == "__main__":
    main()
