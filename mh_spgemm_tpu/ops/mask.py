"""B mask-matrix formation — stage 1 of the pipeline.

Re-encodes each B row as a list of 32-column *tiles*: ``(tilecol, tilemask)``
where bit k of the mask means column ``32*tilecol + k`` is nonzero.  This is
the reference's ``Form_mask_matrix_B`` (``inc/Form_mask_matrix_B.cuh:1-751``,
host driver ``inc/MH_spgemm.cuh:242-295``) re-architected: instead of 13
hash-table kernels binned by row size, the sorted-CSR invariant makes tile
construction a single vectorized pass — tile boundaries are positions where
``col >> 5`` changes, masks are in-run sums of distinct bits (exact because
columns within a row are unique and sorted), and per-row tile counts come
from boundary gathers of one cumsum.

The production entry point is :func:`mask_stage`: ONE jitted program (no
static arguments — all sizes come from array extents, which the pipeline
quantizes, see ops/shapes.py) that forms the mask at capacity ``nnz(B)``
(tiles-per-row <= nnz-per-row, so no tile-count readback is needed before
allocating — unlike the reference, which must read the cub-scanned total
back at ``inc/MH_spgemm.cuh:271`` before its tile malloc) and also emits the
flop upper bound and exact intermediate-product counts per C row plus their
totals as device scalars, fetched by the host in a single transfer.

All functions are *pad-safe*: inputs may be capacity-padded (extra empty
rows; extra nonzeros beyond ``ptr[-1]``) and padded slots never contaminate
real outputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import TILE_BITS
from .expand import row_ids
from .scan import compact, exclusive_cumsum, rows_reduce_int


class MaskMatrix(NamedTuple):
    """Compressed bitmap mask matrix of B (reference ``inc/CSR.h:21-27``).

    ``tilecol``/``tilemask`` are capacity-sized (>= true tile count); slots
    past the true count are zero.
    """

    tileptr: jax.Array    # int32[M+1] exclusive scan of tiles per row
    tilecol: jax.Array    # int32[cap]   tile column (= col >> 5)
    tilemask: jax.Array   # uint32[cap]  bit k set <=> col 32*tilecol+k nnz
    nnz_to_tile: jax.Array  # int32[nnzB] global tile index of each nonzero


class MaskStage(NamedTuple):
    """Output of the fused stage-1 program."""

    mask: MaskMatrix
    fub_row: jax.Array      # int32[M_A]  flop upper bound per C row (tiles)
    prod_row: jax.Array     # int32[M_A]  exact products per C row
    totals: jax.Array       # int64[3]    [total_tiles, t_prime, intprod]
    max_arow: jax.Array     # int32[]     max nnz of an A row (group bound)


@jax.jit
def mask_stage(b_ptr: jax.Array, b_col: jax.Array,
               a_ptr: jax.Array, a_col: jax.Array) -> MaskStage:
    """Fused stage 1: mask matrix of B + per-C-row work estimates.

    Replaces the reference's whole ``Form_mask_matrix_B`` driver
    (``inc/MH_spgemm.cuh:242-295``: per-row-nnz kernel, two binning passes,
    13 tile kernels on 12 streams, cub scan, flop kernel) with one XLA
    program.  Tile capacity = ``b_col`` extent (nnz >= tiles always).
    """
    nnz_b = b_col.shape[0]
    valid_b = jnp.arange(nnz_b, dtype=jnp.int32) < b_ptr[-1]

    btile = jnp.right_shift(b_col, TILE_BITS)
    rows = row_ids(b_ptr, nnz_b)
    is_start = _run_starts(rows, btile) & valid_b

    tiles_per_row = rows_reduce_int(is_start.astype(jnp.int32), b_ptr)
    tileptr = exclusive_cumsum(tiles_per_row, dtype=jnp.int32)
    nnz_to_tile = jnp.cumsum(is_start.astype(jnp.int32)) - 1

    tilecol = compact(btile, is_start, nnz_b)
    run_start_idx = compact(jnp.arange(nnz_b, dtype=jnp.int32), is_start,
                            nnz_b, fill=nnz_b)
    run_end_idx = jnp.concatenate(
        [run_start_idx[1:], jnp.full((1,), nnz_b, jnp.int32)])

    bits = (jnp.uint32(1) << (b_col & jnp.int32((1 << TILE_BITS) - 1)
                              ).astype(jnp.uint32))
    bits = jnp.where(valid_b, bits, jnp.uint32(0))
    bitcum = jnp.cumsum(bits)
    start_excl = jnp.where(run_start_idx > 0,
                           bitcum[jnp.maximum(run_start_idx - 1, 0)],
                           jnp.uint32(0))
    end_incl = jnp.where(run_end_idx > 0,
                         bitcum[jnp.maximum(run_end_idx - 1, 0)],
                         jnp.uint32(0))
    tilemask = end_incl - start_excl
    mask = MaskMatrix(tileptr=tileptr, tilecol=tilecol, tilemask=tilemask,
                      nnz_to_tile=nnz_to_tile)

    # work estimates over A (reference k_calculate_flop / k_calculate_flop_tmp,
    # inc/Form_mask_matrix_B.cuh:14-95)
    fub_row = rows_reduce_int(tiles_per_row[a_col], a_ptr)
    blens = b_ptr[a_col + 1] - b_ptr[a_col]
    prod_row = rows_reduce_int(blens, a_ptr)

    arow_nnz = a_ptr[1:] - a_ptr[:-1]
    totals = jnp.stack([jnp.sum(tiles_per_row.astype(jnp.int64)),
                        jnp.sum(fub_row.astype(jnp.int64)),
                        jnp.sum(prod_row.astype(jnp.int64))])
    return MaskStage(mask=mask, fub_row=fub_row, prod_row=prod_row,
                     totals=totals, max_arow=jnp.max(arow_nnz))


# ---------------------------------------------------------------------------
# Standalone pieces (tests / tooling; the pipeline uses mask_stage)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("m", "nnz"))
def count_tiles(ptr: jax.Array, col: jax.Array, m: int, nnz: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-row distinct-tile counts and their total.

    Reference: ``Calculate_B_tilePtr`` (7 binned kernel variants,
    ``inc/Form_mask_matrix_B.cuh``); here one vector pass.
    Returns (tiles_per_row int32[m], total_tiles int32[]).
    """
    valid = jnp.arange(nnz, dtype=jnp.int32) < ptr[-1]
    btile = jnp.right_shift(col, TILE_BITS)
    rows = row_ids(ptr, nnz)
    is_start = _run_starts(rows, btile) & valid
    tiles_per_row = rows_reduce_int(is_start.astype(jnp.int32), ptr)
    return tiles_per_row, jnp.sum(tiles_per_row)


def form_mask_matrix(ptr: jax.Array, col: jax.Array, m: int, nnz: int,
                     total_tiles: int) -> MaskMatrix:
    """Compact the tile stream into (tileptr, tilecol, tilemask) with an
    exact-size tile array (``total_tiles`` = host-read true count).

    Reference: ``Calculate_B_tileColAndtileMask``
    (``inc/Form_mask_matrix_B.cuh:390-751``).  Kept for tests/tools; the
    pipeline uses the capacity-sized :func:`mask_stage`.
    """
    st = mask_stage(ptr, col, ptr, col)
    mk = st.mask
    return MaskMatrix(tileptr=mk.tileptr, tilecol=mk.tilecol[:total_tiles],
                      tilemask=mk.tilemask[:total_tiles],
                      nnz_to_tile=mk.nnz_to_tile)


def _run_starts(rows: jax.Array, btile: jax.Array) -> jax.Array:
    """True where a new (row, tile) run begins in the CSR stream."""
    n = rows.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=bool)
    first = jnp.ones((1,), dtype=bool)
    changed = (rows[1:] != rows[:-1]) | (btile[1:] != btile[:-1])
    return jnp.concatenate([first, changed])


@functools.partial(jax.jit, static_argnames=("nnz_a",))
def flops_upper_bound(a_ptr: jax.Array, a_col: jax.Array,
                      tiles_per_row_b: jax.Array, nnz_a: int) -> jax.Array:
    """Per-C-row flop upper bound = sum over A(i,:) of tile counts of the
    referenced B rows (reference ``k_calculate_flop``,
    ``inc/Form_mask_matrix_B.cuh:14-55``)."""
    gathered = tiles_per_row_b[a_col]
    return rows_reduce_int(gathered, a_ptr)


@functools.partial(jax.jit, static_argnames=("nnz_a",))
def flops_exact(a_ptr: jax.Array, a_col: jax.Array, b_ptr: jax.Array,
                nnz_a: int) -> jax.Array:
    """Per-C-row intermediate-product count (reference
    ``k_calculate_flop_tmp``, ``inc/Form_mask_matrix_B.cuh:56-95``)."""
    blens = b_ptr[a_col + 1] - b_ptr[a_col]
    return rows_reduce_int(blens, a_ptr)
