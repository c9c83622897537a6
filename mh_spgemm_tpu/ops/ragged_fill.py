"""Mosaic ragged-fill: stream variable-length source spans into a packed
slab at HBM bandwidth instead of per-element XLA gathers.

This is the round-2 answer to the bucketed engine's bottleneck: the
expansion stage's two per-element gathers (~13-15 ns per 4-byte access,
measured) against a DMA-bandwidth capability of ~0.02 ns/element.  It
plays the role of the reference's coalesced shared-memory loads in the
numeric hot loop (``/root/reference/inc/numeric.cuh:215-258``): get the
B-row data next to the compute at bandwidth, not at random-access cost.

Key obstacles and how the kernel sidesteps them (all measured/probed on
the v5e, scripts/probe_fill.py):

* HBM DMA slices have 1024-element granularity in 1-D but ROW (128-lane)
  granularity in 2-D — so everything is addressed as ``[rows, 128]`` and
  windows start at 128-element boundaries.
* Sub-128 source/destination offsets are handled with an in-VMEM lane
  ROTATION (hand-built ``lax.gather``; ``jnp.take_along_axis`` promotes
  indices to int64 under x64, which Mosaic rejects) plus lane-masked
  read-modify-write stores — exact lengths, no overwrite hazard, because
  a Mosaic kernel executes sequentially.
* Per-entry DMA issue cost is amortised by HOST-side planning: entry
  spans are merged into maximal contiguous runs, runs are sorted by
  source and grouped into grid steps that share ONE double-buffered
  source-window DMA (ops/bucketed.py builds the plans).
* f64 cannot cross the Mosaic custom-call boundary, so values travel as
  interleaved int32 words next to their column index ([col, lo, hi] per
  nonzero) and are bitcast back to f64 in XLA afterwards (bitcast is
  exact for f32/int and within 2^-47 relative for f64 on this backend's
  emulated-f64 path — five orders below the 1e-9 value tolerance of the
  reference comparator, src/CSR.cu:60).

The same kernel serves any (src, dst, len) run set whose destinations do
not overlap; the bucketed engine uses it for slab expansion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sublane over-run pad on the window and output: the [BLK, 128] block
# walk may read/write up to 2*BLK rows past a run's last row; the
# buffers carry the slack so no bounds check is needed in the inner
# loop (sized for the largest supported BLK of 32).
PAD_ROWS = 72

_ROT_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _rot128(block, ol):
    """block[i, (l + ol) % 128] — dynamic lane rotation via 2-D gather."""
    lane = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    idx = (lane + ol) & 127
    return jax.lax.gather(
        block, idx[..., None], _ROT_DNUMS, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _fill_kernel(wrows: int, blk: int, nplanes: int, src_stride_rows: int,
                 dst_stride: int, win_row_ref, runs_ref, pairs_ref,
                 out_ref, win_buf, sems):
    """``nplanes == 1``: plain run copy.  ``nplanes > 1``: each run is
    replayed once per PLANE with fixed source/destination offsets
    (plane p reads ``src + p*src_stride_rows*128`` and writes
    ``dst + p*dst_stride``) — one descriptor drives all planes, cutting
    the per-run scalar overhead ~nplanes-fold for the planar extraction
    (col/hi/lo planes share identical span geometry)."""
    g = pl.program_id(0)
    nsteps = pl.num_programs(0)
    lblk = int(np.log2(blk))

    def win_dma(gi, p, slot):
        return pltpu.make_async_copy(
            pairs_ref.at[pl.ds(win_row_ref[gi, 0]
                               + np.int32(p * src_stride_rows),
                               wrows + PAD_ROWS), :],
            win_buf.at[slot, np.int32(p)],
            sems.at[slot, np.int32(p)])

    def start_all(gi, slot):
        for p in range(nplanes):
            win_dma(gi, p, slot).start()

    def wait_all(gi, slot):
        for p in range(nplanes):
            win_dma(gi, p, slot).wait()

    @pl.when(g == 0)
    def _():
        start_all(np.int32(0), np.int32(0))

    slot = jax.lax.rem(g, np.int32(2))
    wait_all(g, slot)

    @pl.when(g + 1 < nsteps)
    def _():
        start_all(g + np.int32(1), np.int32(1) - slot)

    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 0)

    def run_body(e, _):
        src = runs_ref[0, e, 0]          # window-relative elements
        dst0 = runs_ref[0, e, 1]         # flat output elements
        ln = runs_ref[0, e, 2]

        @pl.when(ln > 0)
        def _():
            for p in range(nplanes):     # static unroll over planes
                dst = dst0 + np.int32(p * dst_stride)
                off = src - dst
                or_ = off >> 7
                ol = off & 127
                d0 = dst >> 7
                dend = dst + ln - np.int32(1)
                nblk = (((dend >> 7) - d0) >> lblk) + np.int32(1)
                # pltpu.roll(x, s)[l] = x[(l - s) % 128]; we want
                # x[(l + ol) % 128], so s = 128 - ol
                sh = (np.int32(128) - ol) & 127

                def row_body(i, _, p=p, or_=or_, ol=ol, sh=sh, d0=d0,
                             dst=dst, dend=dend):
                    j = d0 + i * np.int32(blk)
                    wr = j + or_         # >= 0 by the pairs-stream bias
                    a = pltpu.roll(
                        win_buf[slot, np.int32(p), pl.ds(wr, blk), :],
                        sh, 1)
                    b = pltpu.roll(
                        win_buf[slot, np.int32(p),
                                pl.ds(wr + 1, blk), :], sh, 1)
                    sel = jnp.where(lane < 128 - ol, a, b)
                    flat = ((j + rowi) << 7) + lane
                    mask = (flat >= dst) & (flat <= dend)
                    cur = out_ref[pl.ds(j, blk), :]
                    out_ref[pl.ds(j, blk), :] = jnp.where(mask, sel, cur)
                    return 0

                jax.lax.fori_loop(0, nblk, row_body, 0, unroll=False)

        return 0

    jax.lax.fori_loop(0, win_row_ref[g, 1], run_body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=(
    "out_rows", "wrows", "blk", "nplanes", "src_stride_rows",
    "dst_stride", "interpret"))
def ragged_fill(win_row: jax.Array, runs: jax.Array, pairs2d: jax.Array,
                *, out_rows: int, wrows: int, blk: int = 8,
                nplanes: int = 1, src_stride_rows: int = 0,
                dst_stride: int = 0,
                interpret: bool = False) -> jax.Array:
    """Copy runs of int32 words from ``pairs2d`` into a fresh output.

    ``win_row`` int32[S, 2]: per grid step, [0] = source window start
    ROW (window spans ``(wrows + PAD_ROWS) * 128`` elements from there;
    the caller guarantees every step's runs lie within the first
    ``wrows * 128``) and [1] = the number of live runs in the step.
    ``runs`` int32[S, EPG, 3]: per step up to EPG (window-relative src,
    flat dst, len) runs, len 0 = no-op; live runs come first (the
    per-step count skips the padding).  Destinations must not overlap.
    The run descriptors are staged per step in SMEM — scalar reads from
    VMEM cost ~3x more (measured: 586 -> 397 ns/run).
    ``pairs2d`` int32[NR, 128]: source, padded so row reads stay in
    bounds.  Returns int32[out_rows + PAD_ROWS, 128]; slots not covered
    by any run are GARBAGE — callers mask by validity (the bucketed
    engine masks by the plan-time per-row product count).
    """
    S = win_row.shape[0]
    kernel = functools.partial(_fill_kernel, wrows, blk, nplanes,
                               src_stride_rows, dst_stride)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, runs.shape[1], 3),
                         lambda g, wr: (g, np.int32(0), np.int32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((out_rows + PAD_ROWS, 128),
                               lambda g, wr: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nplanes, wrows + PAD_ROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, nplanes)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows + PAD_ROWS, 128),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(win_row, runs, pairs2d)


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:           # pragma: no cover
        return False
