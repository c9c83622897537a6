"""Prototype: ragged segment copy via Pallas DMA vs XLA gather.

SpGEMM's product-stream expansion is a ragged copy of nnz(A) contiguous
B-row slices.  XLA gathers cost ~10-25ns/element on TPU; TPU DMA engines
should stream contiguous segments at near-bandwidth.  Measure both.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch_ms(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:8])
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts), out


LAT = None


def ragged_copy_kernel(src_start_ref, dst_start_ref, nch_ref,
                       src_ref, out_ref, sems, *, be, ch, ring):
    """One grid step copies all chunks of `be` entries.
    Descriptors are scalar-prefetched (SMEM).  DMAs ride a ring of
    `ring` semaphores, up to `ring` outstanding."""
    blk = pl.program_id(0)

    def entry_body(i, j):
        e = blk * be + i
        s = src_start_ref[e]
        d = dst_start_ref[e]
        n = nch_ref[e]

        def chunk_body(c, j):
            dma = pltpu.make_async_copy(
                src_ref.at[pl.ds(s + c * ch, ch)],
                out_ref.at[pl.ds(d + c * ch, ch)],
                sems.at[jax.lax.rem(j, ring)])

            @pl.when(j >= ring)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(0, ch)], out_ref.at[pl.ds(0, ch)],
                    sems.at[jax.lax.rem(j, ring)]).wait()

            dma.start()
            return j + 1

        return jax.lax.fori_loop(0, n, chunk_body, j)

    j = jax.lax.fori_loop(0, be, entry_body, 0)

    # drain the ring
    def drain(k, _):
        @pl.when(k < jnp.minimum(j, ring))
        def _():
            pltpu.make_async_copy(
                src_ref.at[pl.ds(0, ch)], out_ref.at[pl.ds(0, ch)],
                sems.at[k]).wait()
        return 0

    jax.lax.fori_loop(0, ring, drain, 0)


@functools.partial(jax.jit, static_argnames=("be", "ch", "ring", "out_n"))
def ragged_copy(src, src_start, dst_start, nch, be, ch, ring, out_n):
    E = src_start.shape[0]
    grid = E // be
    return pl.pallas_call(
        functools.partial(ragged_copy_kernel, be=be, ch=ch, ring=ring),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
        ),
        out_shape=jax.ShapeDtypeStruct((out_n,), src.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_start, dst_start, nch, src)


def main():
    global LAT
    N = 16_000_000
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda x: jnp.sum(x))
    LAT, _ = fetch_ms(f, jnp.ones((8,), jnp.float32))
    print(f"latency {LAT:.1f} ms")

    for seg_len, ch in ((32, 32), (64, 64), (32, 128), (512, 512)):
        E = N // seg_len
        # random segment starts in a source of 2N
        src = jax.random.uniform(key, (2 * N,), jnp.float32)
        starts = np.random.RandomState(0).randint(
            0, 2 * N - seg_len, size=E).astype(np.int32)
        nch_i = -(-seg_len // ch)
        dst = (np.arange(E, dtype=np.int32) * (nch_i * ch))
        out_n = int(dst[-1]) + nch_i * ch

        s_start = jnp.asarray(starts)
        d_start = jnp.asarray(dst)
        nch = jnp.full((E,), nch_i, jnp.int32)

        # pallas ragged copy
        for be, ring in ((256, 16),):
            t, out = fetch_ms(lambda s, a, b, c: ragged_copy(
                s, a, b, c, be, ch, ring, out_n), src, s_start, d_start, nch)
            eff = (t - LAT) / N * 1e6  # ns per element
            print(f"pallas seglen={seg_len} ch={ch} be={be} ring={ring}: "
                  f"{t - LAT:8.1f} ms  ({eff:.2f} ns/elem)")
            # correctness spot check
            o = np.asarray(out[:seg_len])
            expect = np.asarray(src[starts[0]:starts[0] + seg_len])
            assert np.allclose(o[:seg_len], expect), "MISMATCH"

        # XLA gather equivalent
        gidx = jnp.asarray(
            (starts[:, None] + np.arange(seg_len)[None, :]).reshape(-1))
        g = jax.jit(lambda s, i: s[i])
        t, _ = fetch_ms(g, src, gidx)
        eff = (t - LAT) / N * 1e6
        print(f"gather seglen={seg_len}              : "
              f"{t - LAT:8.1f} ms  ({eff:.2f} ns/elem)")


if __name__ == "__main__":
    main()
