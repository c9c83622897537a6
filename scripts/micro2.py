"""Micro-benchmarks driving pipeline design decisions on real TPU.

`block_until_ready` is unreliable through the axon relay, so each op is
timed by chaining ITERS data-dependent repetitions inside ONE jitted
program, fetching a scalar, and subtracting the measured null latency.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

ITERS = 8


def fetch_ms(fn, *args):
    """Wall ms for dispatch + scalar fetch of fn(*args)."""
    out = fn(*args)
    np.asarray(out)  # warm compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


_LAT = None


def null_latency():
    global _LAT
    if _LAT is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8,), jnp.float32)
        _LAT = fetch_ms(f, x)
        print(f"null dispatch+fetch latency: {_LAT:.1f} ms")
    return _LAT


def timed_chain(make_step, init_args, label):
    """make_step: fn(*state) -> state (same structure). Chains ITERS calls
    inside one jit; reports per-iteration ms."""

    @jax.jit
    def chained(*state):
        for _ in range(ITERS):
            state = make_step(*state)
        leaves = jax.tree.leaves(state)
        return sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)

    total = fetch_ms(chained, *init_args)
    per = (total - null_latency()) / ITERS
    print(f"{label:32s}: {per:8.1f} ms/op")
    return per


def main():
    key = jax.random.PRNGKey(0)
    N = 16_000_000
    null_latency()

    k1 = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
    p1 = jnp.arange(N, dtype=jnp.int32)

    # flat sort: feed key output back as key (comparator cost data-indep)
    timed_chain(lambda k, v: jax.lax.sort((k, v), num_keys=1),
                (k1, p1), "flat sort 16M k+1p")
    timed_chain(lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1),
                (k1, p1, p1, p1), "flat sort 16M k+3p")

    for W in (512, 2048):
        R = N // W
        k2 = k1[:R * W].reshape(R, W)
        v2 = p1[:R * W].reshape(R, W)
        timed_chain(lambda k, v: jax.lax.sort((k, v), num_keys=1,
                                              dimension=1),
                    (k2, v2), f"batched sort {R}x{W} k+1p")

    # scatter-add 16M scalars (index dep via values)
    idx = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
    v = jnp.ones((N,), jnp.float32)
    timed_chain(lambda i, v: (i, jnp.zeros((N,), jnp.float32).at[i].add(v)),
                (idx, v), "scatter-add 16M f32 random")

    # row scatter-add 2M x 32 -> 0.5M x 32 (sorted ids, like run ids)
    Nr = 2_000_000
    ridx = jnp.sort(jax.random.randint(key, (Nr,), 0, 500_000,
                                       dtype=jnp.int32))
    rv = jnp.ones((Nr, 32), jnp.float32)
    def rowscat(i, v):
        out = jnp.zeros((500_000, 32), v.dtype).at[i].add(
            v, indices_are_sorted=True)
        return i, v.at[0, 0].add(out[0, 0])  # scalar dep only

    timed_chain(rowscat, (ridx, rv), "row scat-add 2Mx32 f32 sorted")
    rv64 = rv.astype(jnp.float64)
    timed_chain(rowscat, (ridx, rv64), "row scat-add 2Mx32 f64 sorted")

    def seg(i, v):
        out = jax.ops.segment_sum(v, i, num_segments=500_000,
                                  indices_are_sorted=True)
        return i, v.at[0, 0].add(out[0, 0])

    timed_chain(seg, (ridx, rv), "segment_sum 2Mx32 f32 sorted")

    # gathers
    src32 = jax.random.uniform(key, (N,), jnp.float32)
    src64 = src32.astype(jnp.float64)
    gi = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)

    def gath(s, i):
        out = s[i]
        return s.at[0].add(out.reshape(-1)[0]), i

    timed_chain(gath, (src32, gi), "gather 16M f32 random")
    timed_chain(gath, (src64, gi), "gather 16M f64 random")
    base = jax.random.randint(key, (N // 32,), 0, N - 32, dtype=jnp.int32)
    gloc = base[:, None] + jnp.arange(32, dtype=jnp.int32)[None, :]
    timed_chain(gath, (src32, gloc), "gather .5Mx32 f32 tile-local")
    timed_chain(gath, (src64, gloc), "gather .5Mx32 f64 tile-local")

    # Hillis-Steele segmented OR (7 passes) over 16M uint32
    import sys
    sys.path.insert(0, "/root/repo")
    from mh_spgemm_tpu.ops.scan import seg_scan
    flags = jax.random.uniform(key, (N,)) < 0.3
    masks = k1.astype(jnp.uint32)
    timed_chain(lambda f, m: (f, seg_scan(jnp.bitwise_or, f, m, 128)),
                (flags, masks), "seg OR-scan 16M 7 passes")

    timed_chain(lambda a: (a * 1.0000001,), (src64,), "mul 16M f64")
    timed_chain(lambda a: (jnp.cumsum(a),), (p1,), "cumsum 16M i32")
    # repeat-expansion (the stream builder)
    lens = jnp.full((N // 16,), 16, jnp.int32)

    def rep(l):
        out = jnp.repeat(jnp.arange(N // 16, dtype=jnp.int32), l,
                         total_repeat_length=N)
        return (l.at[0].add(out[0]),)

    timed_chain(rep, (lens,), "repeat-expand 1M->16M")


if __name__ == "__main__":
    main()
