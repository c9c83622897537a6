"""Microbench: gather cost vs operand size on real TPU.

micro_group_gather measured wide k=4 slice gather at 3.3 ns/idx on a
4M-word operand — 4x faster than round 4's measurement of the same op.
Either the host/chip state improved or the cost is operand-size
dependent.  Sweep the operand size at fixed index count.
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
            acc = acc + sum(jnp.sum(o[:1].astype(jnp.float32))
                            for o in outs)
            src = src + (acc.astype(jnp.int32) & 0)
        return acc

    total = fetch_ms(chained, *init)
    per_ms = (total - null_latency()) / ITERS
    print(f"{label:44s}: {per_ms:8.2f} ms  "
          f"{per_ms * 1e6 / idx:6.1f} ns/idx", flush=True)


_DN = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))


def main():
    rng = np.random.default_rng(0)
    for logn in (20, 22, 24, 26):
        n = 1 << logn
        flat = jnp.asarray(rng.integers(0, 99, n * 4 + 64,
                                        ).astype(np.int32))
        src = jnp.asarray(rng.integers(0, n, size=S).astype(np.int32))
        timed(lambda s, f: (jax.lax.gather(
            f, (s * 4)[:, None], _DN, slice_sizes=(4,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS),),
            (src, flat), f"wide k=4, operand {n * 16 >> 20} MB", S)
        col = jnp.asarray(rng.integers(0, 99, n).astype(np.int32))
        timed(lambda s, c: (c[s],), (src, col),
              f"1 take i32, operand {n * 4 >> 20} MB", S)


if __name__ == "__main__":
    main()
