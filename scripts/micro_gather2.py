"""Microbench v2: expansion-gather variants with FULL output consumption.

The earlier micro scripts reduced ``o[:1]`` — XLA can slice-fuse a
gather and skip most of the work, so those numbers undermeasure.  Here
every output is fully summed (the sum is fused, bandwidth-cheap, and
forces materialization of every gathered element).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

ITERS = 8
S = 1 << 19


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
        _LAT = fetch_ms(f, jnp.ones((8,), jnp.float32))
        print(f"null latency: {_LAT:.1f} ms", flush=True)
    return _LAT


def timed(make_step, init, label, idx):
    @jax.jit
    def chained(src, *data):
        acc = jnp.float32(0)
        for _ in range(ITERS):
            outs = make_step(src, *data)
            acc = acc + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            src = src + (acc.astype(jnp.int32) & 0)
        return acc

    total = fetch_ms(chained, *init)
    per_ms = (total - null_latency()) / ITERS
    print(f"{label:46s}: {per_ms:8.2f} ms  "
          f"{per_ms * 1e6 / idx:6.1f} ns/idx", flush=True)


_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))


def sg(s, f, k, scale=None):
    return (jax.lax.gather(
        f, (s * np.int32(scale or k))[:, None], _DN, slice_sizes=(k,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS),)


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    flat = jnp.asarray(rng.integers(0, 99, n * 4 + 64).astype(np.int32))
    col = jnp.asarray(rng.integers(0, 99, n).astype(np.int32))
    hi = jnp.asarray(rng.random(n, np.float32))
    lo = jnp.asarray(rng.random(n, np.float32))
    src = jnp.asarray(rng.integers(0, n, size=S).astype(np.int32))

    timed(lambda s, c: (c[s],), (src, col), "1 take i32", S)
    timed(lambda s, c, h, l: (c[s], h[s], l[s]), (src, col, hi, lo),
          "3 takes i32 (df32 takes path)", S)
    timed(lambda s, f: sg(s, f, 4), (src, flat), "wide k=4 slice", S)
    timed(lambda s, f: sg(s, f, 2), (src, flat), "wide k=2 slice", S)
    for g in (2, 4, 8):
        srcL = jnp.asarray(
            rng.integers(0, n, size=S // g).astype(np.int32))
        timed(lambda s, f, g=g: sg(s, f, 4 * g, scale=4), (srcL, flat),
              f"grouped G={g} (k={4 * g:2d}, {S // g} idx)", S // g)
    # sorted / row-local indices (the engine's src has row locality)
    ssrc = jnp.asarray(np.sort(
        rng.integers(0, n, size=S).astype(np.int32)))
    timed(lambda s, f: sg(s, f, 4), (ssrc, flat), "wide k=4 sorted idx", S)
    # big operand
    n2 = 1 << 24
    flat2 = jnp.asarray(rng.integers(0, 99, n2 * 4 + 64).astype(np.int32))
    src2 = jnp.asarray(rng.integers(0, n2, size=S).astype(np.int32))
    timed(lambda s, f: sg(s, f, 4), (src2, flat2),
          "wide k=4, 256 MB operand", S)
    col2 = jnp.asarray(rng.integers(0, 99, n2).astype(np.int32))
    timed(lambda s, c: (c[s],), (src2, col2),
          "1 take i32, 64 MB operand", S)
    timed(lambda s, c, h, l: (c[s], h[s], l[s]),
          (src2, col2,
           jnp.asarray(rng.random(n2, np.float32)),
           jnp.asarray(rng.random(n2, np.float32))),
          "3 takes i32, 64 MB operands", S)


if __name__ == "__main__":
    main()
