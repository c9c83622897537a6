"""Probe the Mosaic building blocks of the ragged-fill expansion kernel
on the real chip: dynamic-sublane window DMA, in-kernel lane rotation
under x64, dynamic-offset [8,128] RMW stores, traced-bound row loops,
and VMEM-streamed run descriptors with scalar reads.

Miniature end-to-end: copy RUNS (src, dst, len) from a flat source array
into a flat destination, one window per grid step.
"""
import sys

sys.setrecursionlimit(20000)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)   # engine runs under x64

WROWS = 32          # window rows (32*128 = 4096 elements)
PAD_ROWS = 10       # window/out sublane over-run pad


_ROT_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _rot128(block, ol):
    """block[i, (l + ol) % 128] via lane gather.  Hand-built lax.gather:
    jnp.take_along_axis promotes indices to int64 under x64, which Mosaic
    rejects."""
    lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    idx = (lane + ol) & 127
    return jax.lax.gather(
        block, idx[..., None], _ROT_DNUMS, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def make_fill(S, EPG, out_rows):
    def kernel(win_row_ref, runs_ref, pairs_ref, out_ref, win_buf, sems):
        g = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def win_dma(gi, slot):
            return pltpu.make_async_copy(
                pairs_ref.at[pl.ds(win_row_ref[gi], WROWS + PAD_ROWS), :],
                win_buf.at[slot],
                sems.at[slot])

        @pl.when(g == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            win_dma(np.int32(0), np.int32(0)).start()

        slot = jax.lax.rem(g, np.int32(2))
        win_dma(g, slot).wait()

        @pl.when(g + 1 < nsteps)
        def _():
            win_dma(g + np.int32(1), np.int32(1) - slot).start()

        def run_body(e, _):
            src = runs_ref[0, e, 0]     # window-relative elements
            dst = runs_ref[0, e, 1]
            ln = runs_ref[0, e, 2]

            @pl.when(ln > 0)
            def _():
                off = src - dst
                or_ = off >> 7
                ol = off & 127
                d0 = dst >> 7
                dend = dst + ln - 1
                nblk = (((dend >> 7) - d0) >> 3) + np.int32(1)

                def row_body(i, _):
                    j = d0 + i * 8
                    wr = j + or_
                    a = _rot128(win_buf[slot, pl.ds(wr, 8), :], ol)
                    b = _rot128(win_buf[slot, pl.ds(wr + 1, 8), :], ol)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                    sel = jnp.where(lane < 128 - ol, a, b)
                    flat = ((j + jax.lax.broadcasted_iota(
                        jnp.int32, (8, 128), 0)) << 7) + lane
                    mask = (flat >= dst) & (flat <= dend)
                    cur = out_ref[pl.ds(j, 8), :]
                    out_ref[pl.ds(j, 8), :] = jnp.where(mask, sel, cur)
                    return 0

                jax.lax.fori_loop(0, nblk, row_body, 0)

            return 0

        jax.lax.fori_loop(0, EPG, run_body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # win_row in SMEM
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, EPG, 3), lambda g, wr: (g, np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),      # run descriptors
            pl.BlockSpec(memory_space=pl.ANY),          # pairs [NR,128]
        ],
        out_specs=pl.BlockSpec((out_rows + PAD_ROWS, 128),
                               lambda g, wr: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WROWS + PAD_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows + PAD_ROWS, 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def main():
    rng = np.random.default_rng(0)
    NSRC = 1 << 15                      # source elements
    out_elems = 1 << 14
    out_rows = out_elems // 128
    S, EPG = 4, 16

    src_flat = rng.integers(1, 1 << 30, NSRC).astype(np.int32)
    pairs = np.zeros(((NSRC // 128) + WROWS + PAD_ROWS, 128), np.int32)
    pairs.reshape(-1)[:NSRC] = src_flat

    # build random non-overlapping dst runs, sorted by src
    win_row = np.zeros(S, np.int32)
    runs = np.zeros((S, EPG, 3), np.int32)
    expect = np.zeros(out_elems, np.int32)
    dst_cursor = 0
    for g in range(S):
        wrow = g * ((NSRC // 128) // S)
        win_row[g] = wrow
        for e in range(EPG):
            ln = int(rng.integers(1, 400))
            if dst_cursor + ln + 7 > out_elems:
                break
            src_abs = int(rng.integers(0, WROWS * 128 - ln))
            dst = dst_cursor + int(rng.integers(0, 7))    # misalign a bit
            dst_cursor = dst + ln
            runs[g, e] = (src_abs, dst, ln)
            expect[dst:dst + ln] = pairs.reshape(-1)[
                wrow * 128 + src_abs: wrow * 128 + src_abs + ln]

    call = make_fill(S, EPG, out_rows)
    out = np.asarray(jax.jit(call)(
        jnp.asarray(win_row), jnp.asarray(runs), jnp.asarray(pairs)))
    got = out.reshape(-1)[:out_elems]
    ok = np.array_equal(got, expect)
    print("ragged fill correct:", ok)
    if not ok:
        bad = np.flatnonzero(got != expect)
        print("first diffs at", bad[:10], "of", bad.size)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
