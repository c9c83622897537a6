"""Microbench: grouped slice-gather — the short-span frontend candidate.

Round-4 measured XLA TPU gather at ~26 ns per index for 3 separate takes
and ~14 ns/slot for one 4-word slice per slot (wide gather).  The cost is
per-INDEX, so fetching G products (G*k words) per index should divide the
per-product cost by ~G at the price of G-alignment slot padding in the
class slab.  This measures the per-index cost of slice sizes 4..64 words
and the derived per-product cost for span-2.3 plans (scircuit shape).

Run on the real chip:  python scripts/micro_group_gather.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

ITERS = 8
N_SRC = 1 << 20          # B nonzeros
S = 1 << 19              # gather indices issued


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


def timed(make_step, init, label, idx):
    @jax.jit
    def chained(src, *data):
        acc = jnp.float32(0)
        for _ in range(ITERS):
            outs = make_step(src, *data)
            acc = acc + sum(jnp.sum(o[:1].astype(jnp.float32))
                            for o in outs)
            src = src + (acc.astype(jnp.int32) & 0)
        return acc

    total = fetch_ms(chained, *init)
    per_ms = (total - null_latency()) / ITERS
    print(f"{label:46s}: {per_ms:8.2f} ms  "
          f"{per_ms * 1e6 / idx:6.1f} ns/idx", flush=True)
    return per_ms


_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))


def slice_gather(s, f, k):
    return (jax.lax.gather(
        f, (s * np.int32(k))[:, None], _DN, slice_sizes=(k,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS),)


def main():
    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.integers(0, 1 << 20, N_SRC * 4 + 256).astype(np.int32))

    # per-index cost vs slice width (4 = current wide df32)
    for k in (4, 8, 16, 32, 64):
        n_idx = S
        src = jnp.asarray(
            rng.integers(0, N_SRC - 64, size=n_idx).astype(np.int32))
        timed(lambda s, f, k=k: slice_gather(s, f, k), (src, flat),
              f"slice gather k={k:2d} words ({S} idx)", n_idx)

    # grouped frontend shapes: HALF or QUARTER the indices at 2x/4x width
    for g, k in ((2, 8), (4, 16), (8, 32)):
        n_idx = S // g
        src = jnp.asarray(
            rng.integers(0, N_SRC - 64, size=n_idx).astype(np.int32))
        timed(lambda s, f, k=k: slice_gather(s, f, k), (src, flat),
              f"grouped G={g} (k={k:2d}, {n_idx} idx)", n_idx)

    # scatter side: final-position scatter of k-word rows (the
    # direct-to-CSR extraction alternative)
    RW = S
    for k in (4, 8):
        dst = jnp.asarray(np.sort(
            rng.choice(RW, size=S // 2, replace=False)).astype(np.int32))
        rows = jnp.asarray(
            rng.integers(0, 1 << 20, (S // 2, k)).astype(np.int32))
        timed(lambda d, r: (jnp.zeros((RW, k), jnp.int32)
                            .at[d].set(r, mode="drop"),),
              (dst, rows), f"row scatter [n,{k}] ({S // 2} idx)", S // 2)

    # 3-take baseline for reference
    col = jnp.asarray(rng.integers(0, 1 << 20, N_SRC).astype(np.int32))
    hi = jnp.asarray(rng.random(N_SRC, np.float32))
    lo = jnp.asarray(rng.random(N_SRC, np.float32))
    src = jnp.asarray(rng.integers(0, N_SRC, size=S).astype(np.int32))
    timed(lambda s, c, h, l: (c[s], h[s], l[s]), (src, col, hi, lo),
          "3 takes (df32 baseline)", S)
    timed(lambda s, f: slice_gather(s, f, 4), (src, flat),
          "wide k=4 baseline", S)


if __name__ == "__main__":
    main()
