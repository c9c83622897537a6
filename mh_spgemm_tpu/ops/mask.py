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

Split into a *count* step (dynamic total tile count T is read back by the
host, like the reference's tile-count readback at ``inc/MH_spgemm.cuh:271``)
and a *form* step jitted with static T.
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
    """Compressed bitmap mask matrix of B (reference ``inc/CSR.h:21-27``)."""

    tileptr: jax.Array    # int32[M+1] exclusive scan of tiles per row
    tilecol: jax.Array    # int32[T]   tile column (= col >> 5)
    tilemask: jax.Array   # uint32[T]  bit k set <=> col 32*tilecol+k nonzero
    nnz_to_tile: jax.Array  # int32[nnzB] global tile index of each nonzero


@functools.partial(jax.jit, static_argnames=("m", "nnz"))
def count_tiles(ptr: jax.Array, col: jax.Array, m: int, nnz: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Per-row distinct-tile counts and their total.

    Reference: ``Calculate_B_tilePtr`` (7 binned kernel variants,
    ``inc/Form_mask_matrix_B.cuh``); here one vector pass.
    Returns (tiles_per_row int32[m], total_tiles int32[]).
    """
    btile = jnp.right_shift(col, TILE_BITS)
    rows = row_ids(ptr, nnz)
    is_start = _run_starts(rows, btile)
    tiles_per_row = rows_reduce_int(is_start.astype(jnp.int32), ptr)
    return tiles_per_row, jnp.sum(tiles_per_row)


@functools.partial(jax.jit, static_argnames=("m", "nnz", "total_tiles"))
def form_mask_matrix(ptr: jax.Array, col: jax.Array, m: int, nnz: int,
                     total_tiles: int) -> MaskMatrix:
    """Compact the tile stream into (tileptr, tilecol, tilemask).

    Reference: ``Calculate_B_tileColAndtileMask``
    (``inc/Form_mask_matrix_B.cuh:390-751``).  The per-tile OR of bit masks
    becomes an in-run *sum* of ``1 << (col & 31)`` (bits within a run are
    distinct for canonical CSR), recovered exactly from one uint32 cumsum
    via boundary differences (mod-2^32 arithmetic).
    """
    btile = jnp.right_shift(col, TILE_BITS)
    rows = row_ids(ptr, nnz)
    is_start = _run_starts(rows, btile)

    tiles_per_row = rows_reduce_int(is_start.astype(jnp.int32), ptr)
    tileptr = exclusive_cumsum(tiles_per_row, dtype=jnp.int32)

    # global tile index of every nonzero (for numeric-stage product->tile
    # mapping); cumsum(is_start)-1 in int32
    tile_of = jnp.cumsum(is_start.astype(jnp.int32)) - 1

    tilecol = compact(btile, is_start, total_tiles)
    run_start_idx = compact(jnp.arange(nnz, dtype=jnp.int32), is_start,
                            total_tiles, fill=nnz)
    run_end_idx = jnp.concatenate(
        [run_start_idx[1:], jnp.full((1,), nnz, jnp.int32)])

    bits = (jnp.uint32(1) << (col & (jnp.int32((1 << TILE_BITS) - 1))
                              ).astype(jnp.uint32))
    bitcum = jnp.cumsum(bits)
    start_excl = jnp.where(run_start_idx > 0,
                           bitcum[jnp.maximum(run_start_idx - 1, 0)],
                           jnp.uint32(0))
    end_incl = jnp.where(run_end_idx > 0,
                         bitcum[jnp.maximum(run_end_idx - 1, 0)],
                         jnp.uint32(0))
    tilemask = end_incl - start_excl
    return MaskMatrix(tileptr=tileptr, tilecol=tilecol, tilemask=tilemask,
                      nnz_to_tile=tile_of)


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
