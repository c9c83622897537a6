"""Symbolic stage: exact nnz(C) per row + C tile structure.

TPU re-architecture of the reference's ``Calculate_C_nnz``
(``inc/Calculate_C_nnz.cuh:88-835``, host ``inc/MH_spgemm.cuh:297-362``):
the GPU version hashes B tile columns into shared-memory tables with
``atomicOr`` of tile masks and popcounts the result.  Here the same exact
count comes from a *tile-granularity* product stream — already grouped by C
row — sorted lexicographically by ``(row, tilecol)``, followed by a
segmented OR of masks and a popcount at run ends.  The dedup therefore runs
on ``T' = Sigma_e tiles(B[A.col[e]])`` items instead of the full
intermediate-product count: the same ~32x shrink the mask matrix buys the
reference's hash tables.

The only jit statics are the stream capacity ``total`` (the quantized
T' readback — the reference pays the same host sync for its flop scan,
``inc/MH_spgemm.cuh:271``) and the scan pass bound ``max_group``; every
other size comes from array extents, and all inputs may be capacity-padded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TILE_BITS
from .expand import expand_products
from .mask import MaskMatrix
from .scan import compact, exclusive_cumsum, rows_reduce_int, seg_scan


class SymbolicResult(NamedTuple):
    """Everything the numeric stage needs about C's structure."""

    crow_nnz: jax.Array       # int32[M]   exact nnz per C row
    ctiles_row: jax.Array     # int32[M]   C tiles per row
    run_id_unsorted: jax.Array  # int32[T'] C-tile id of each stream element
    sort_row: jax.Array       # int32[T']  sorted stream: C row
    sort_tcol: jax.Array      # int32[T']  sorted stream: tile column
    or_mask: jax.Array        # uint32[T'] segmented-OR scan (totals at ends)
    is_end: jax.Array         # bool[T']   True at run ends (valid runs)
    totals: jax.Array         # int64[2]   [nnz_C, tile count Tc]


@functools.partial(jax.jit, static_argnames=("total", "max_group"))
def symbolic(a_ptr: jax.Array, a_col: jax.Array, mask: MaskMatrix,
             total: int, max_group: int) -> SymbolicResult:
    """Exact symbolic pass over the tile-granularity product stream.

    ``total`` = quantized T' (flop upper bound, host-read), ``max_group`` =
    static bound on products per (row, tilecol) group (<= max nnz of an A
    row) — it caps the segmented-scan pass count, the TPU analogue of the
    reference's adaptive group sizing (``inc/Calculate_C_nnz.cuh:47-87``).
    """
    m_pad = a_ptr.shape[0] - 1
    ps = expand_products(a_ptr, a_col, mask.tileptr, total, a_col.shape[0])
    tcol = mask.tilecol[ps.src]
    tmask = mask.tilemask[ps.src]
    crow = jnp.where(ps.valid, ps.crow, jnp.int32(m_pad))  # padding last

    # orig position carried through the sort so numeric can map unsorted
    # stream elements to their C tile.
    orig = jnp.arange(total, dtype=jnp.int32)
    s_row, s_tcol, s_mask, s_orig = jax.lax.sort(
        (crow, tcol, tmask, orig), num_keys=2)

    new = _run_starts2(s_row, s_tcol)
    or_scan = seg_scan(jnp.bitwise_or, new, s_mask, max_group)
    is_end = jnp.concatenate([new[1:], jnp.ones((1,), bool)])
    valid_run = s_row < m_pad
    popc = jax.lax.population_count(or_scan).astype(jnp.int32)
    contrib = jnp.where(is_end & valid_run, popc, 0)
    tile_contrib = jnp.where(is_end & valid_run, 1, 0)

    run_id_sorted = jnp.cumsum(new.astype(jnp.int32)) - 1
    run_id_unsorted = jnp.zeros((total,), jnp.int32).at[s_orig].set(
        run_id_sorted, unique_indices=True)

    # per-row reductions: the sorted stream keeps exactly
    # flops_upper_bound[i] elements for row i, so the row pointer over the
    # stream is the exclusive cumsum of the upper bound.
    lens = mask.tileptr[a_col + 1] - mask.tileptr[a_col]
    fub_row = rows_reduce_int(lens, a_ptr)
    f_ex = exclusive_cumsum(fub_row, dtype=jnp.int32)
    crow_nnz = rows_reduce_int(contrib, f_ex)
    ctiles_row = rows_reduce_int(tile_contrib, f_ex)

    totals = jnp.stack([jnp.sum(crow_nnz.astype(jnp.int64)),
                        jnp.sum(ctiles_row.astype(jnp.int64))])
    return SymbolicResult(crow_nnz=crow_nnz, ctiles_row=ctiles_row,
                          run_id_unsorted=run_id_unsorted,
                          sort_row=s_row, sort_tcol=s_tcol,
                          or_mask=or_scan, is_end=is_end & valid_run,
                          totals=totals)


class CStructure(NamedTuple):
    """Compacted C tile structure + expanded (sorted) column indices."""

    cptr: jax.Array        # int32[M+1]
    ccol: jax.Array        # int32[nnzC] sorted per row
    ctile_col: jax.Array   # int32[Tc]
    ctile_mask: jax.Array  # uint32[Tc]
    ctile_base: jax.Array  # int32[Tc+1] value offset of each C tile


@functools.partial(jax.jit, static_argnames=("tc", "nnz_c"))
def c_structure(sym: SymbolicResult, tc: int, nnz_c: int) -> CStructure:
    """Compact the symbolic run ends into C's tile list and expand the tile
    masks into the final, per-row-sorted column index array.

    This replaces the reference's numeric-stage per-row compaction + sort
    (``inc/numeric.cuh:264-297,424-471``): tiles come out of the symbolic
    sort ordered by (row, tilecol) and bits are enumerated ascending, so
    C's columns are born sorted — no count-sort / bitonic sort needed.
    ``tc`` / ``nnz_c`` are quantized capacities (>= true counts).
    """
    flags = sym.is_end
    ctile_col = compact(sym.sort_tcol, flags, tc)
    ctile_mask = compact(sym.or_mask, flags, tc)
    popc = jax.lax.population_count(ctile_mask).astype(jnp.int32)
    ctile_base = exclusive_cumsum(popc, dtype=jnp.int32)

    cptr = exclusive_cumsum(sym.crow_nnz, dtype=jnp.int32)

    # expand masks -> columns: a (Tc, 32) grid of candidate bits, compacted.
    bit = jnp.arange(1 << TILE_BITS, dtype=jnp.uint32)[None, :]
    keep = ((ctile_mask[:, None] >> bit) & jnp.uint32(1)).astype(bool)
    colgrid = (ctile_col[:, None] << TILE_BITS) + bit.astype(jnp.int32)
    ccol = compact(colgrid.reshape(-1), keep.reshape(-1), nnz_c)
    return CStructure(cptr=cptr, ccol=ccol, ctile_col=ctile_col,
                      ctile_mask=ctile_mask, ctile_base=ctile_base)


def _run_starts2(a: jax.Array, b: jax.Array) -> jax.Array:
    n = a.shape[0]
    first = jnp.ones((1,), dtype=bool)
    changed = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return jnp.concatenate([first, changed])
