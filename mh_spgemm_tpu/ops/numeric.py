"""Numeric stage: value accumulation into C.

Two TPU-native strategies replace the reference's five binned
shared-memory-hash kernels (``inc/numeric.cuh:1-638``):

* :func:`finish_masked` — the MH-style mask-guided path, fused with the C
  structure expansion.  The symbolic stage already fixed C's structure, and
  the mask tells every intermediate product its exact destination: ``dst =
  tile_base + popcount(mask & ((1<<bit)-1))``.  Accumulation is then one
  scatter-add — the direct analogue of the reference's ``atomicAdd`` into a
  hash slot whose key was just resolved (``inc/numeric.cuh:215-258``),
  except the "hash probe" is a closed-form rank computation, conflict-free
  by construction.

* :func:`numeric_esc` — fused expand-sort-compress at column granularity.
  No symbolic stage needed: the (row, col)-sorted product stream yields
  nnz(C), structure and values in one pass (sort + segmented sum + run-end
  compaction).  Used as the robust fallback and as an in-framework
  differential check of the masked path.

Values default to float64 (reference ``VALUE_TYPE double``) so results meet
the 1e-9 comparator tolerance; float32 mode trades precision for speed.
Jit statics are quantized capacities only; true sizes come from array
extents / traced scalars, so all inputs may be capacity-padded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import TILE_BITS
from .expand import expand_products
from .mask import MaskMatrix
from .scan import compact, exclusive_cumsum, rows_reduce_int, seg_scan
from .symbolic import (CStructure, SymbolicResult, _run_starts2,
                       c_structure)


@functools.partial(jax.jit, static_argnames=("total", "tc", "nnz_c"))
def finish_masked(a_ptr, a_col, a_val, b_ptr, b_col, b_val,
                  mask: MaskMatrix, sym: SymbolicResult,
                  total: int, tc: int, nnz_c: int
                  ) -> Tuple[CStructure, jax.Array]:
    """Fused C-structure expansion + mask-guided numeric accumulation.

    ``total`` = quantized intermediate-product count P, ``tc`` / ``nnz_c`` =
    quantized C tile / nonzero counts.  Returns (structure, values); the
    value array is ``nnz_c``-capacity with a zero tail.
    """
    cs = c_structure(sym, tc, nnz_c)

    ps = expand_products(a_ptr, a_col, b_ptr, total, a_col.shape[0])
    c = b_col[ps.src]

    # map product -> symbolic stream element -> C tile
    k = a_col[ps.a_idx]
    lens_t = mask.tileptr[a_col + 1] - mask.tileptr[a_col]
    sym_start = exclusive_cumsum(lens_t, dtype=jnp.int32)
    s = sym_start[ps.a_idx] + (mask.nnz_to_tile[ps.src] - mask.tileptr[k])
    tile = sym.run_id_unsorted[s]

    bit = (c & jnp.int32((1 << TILE_BITS) - 1)).astype(jnp.uint32)
    below = (jnp.uint32(1) << bit) - jnp.uint32(1)
    rank = jax.lax.population_count(
        cs.ctile_mask[tile] & below).astype(jnp.int32)
    dst = cs.ctile_base[tile] + rank

    v = a_val[ps.a_idx] * b_val[ps.src]
    v = jnp.where(ps.valid, v, jnp.zeros((), v.dtype))
    dst = jnp.where(ps.valid, dst, jnp.int32(0))
    cval = jnp.zeros((nnz_c,), v.dtype).at[dst].add(v)
    return cs, cval


def numeric_masked(a_ptr, a_col, a_val, b_ptr, b_col, b_val,
                   mask: MaskMatrix, sym: SymbolicResult, cs: CStructure,
                   nnz_a: int, total: int, nnz_c: int) -> jax.Array:
    """Compatibility wrapper: values only, structure precomputed.  The
    pipeline uses :func:`finish_masked` (one fused program)."""
    tc = cs.ctile_col.shape[0]
    _, cval = finish_masked(a_ptr, a_col, a_val, b_ptr, b_col, b_val,
                            mask, sym, total, tc, nnz_c)
    return cval


class ESCResult(NamedTuple):
    """Capacity-padded output of the fused ESC pipeline."""

    cptr: jax.Array       # int32[M+1]  exclusive scan of per-row nnz
    crow_nnz: jax.Array   # int32[M]    exact nnz per row
    col_cap: jax.Array    # int32[cap]  compacted columns (tail = fill)
    val_cap: jax.Array    # float[cap]  compacted values
    nnz_total: jax.Array  # int32[]     total nnz(C)


@functools.partial(jax.jit, static_argnames=("total", "cap", "max_group"))
def numeric_esc(a_ptr, a_col, a_val, b_ptr, b_col, b_val,
                total: int, cap: int, max_group: int) -> ESCResult:
    """Fused expand-sort-compress SpGEMM.

    ``total`` is the quantized product-stream capacity, ``cap`` a static
    output capacity (<= total, >= nnz(C)); the host reads ``nnz_total``
    back and trims.  ``max_group`` bounds products per (row, col) pair
    (<= max nnz of an A row).
    """
    m_pad = a_ptr.shape[0] - 1
    ps = expand_products(a_ptr, a_col, b_ptr, total, a_col.shape[0])
    c = b_col[ps.src]
    crow = jnp.where(ps.valid, ps.crow, jnp.int32(m_pad))
    orig = jnp.arange(total, dtype=jnp.int32)
    s_row, s_col, s_orig = jax.lax.sort((crow, c, orig), num_keys=2)

    # values gathered post-sort (the sort carries one int32 instead of a
    # float64 payload)
    v = a_val[ps.a_idx[s_orig]] * b_val[ps.src[s_orig]]
    v = jnp.where(s_row < m_pad, v, jnp.zeros((), v.dtype))

    new = _run_starts2(s_row, s_col)
    vsum = seg_scan(jnp.add, new, v, max_group)
    is_end = (jnp.concatenate([new[1:], jnp.ones((1,), bool)])
              & (s_row < m_pad))

    contrib = is_end.astype(jnp.int32)
    lens = b_ptr[a_col + 1] - b_ptr[a_col]
    valid_a = jnp.arange(a_col.shape[0], dtype=jnp.int32) < a_ptr[-1]
    p_row = rows_reduce_int(jnp.where(valid_a, lens, 0), a_ptr)
    p_ex = exclusive_cumsum(p_row, dtype=jnp.int32)
    crow_nnz = rows_reduce_int(contrib, p_ex)
    cptr = exclusive_cumsum(crow_nnz, dtype=jnp.int32)

    col_cap = compact(s_col, is_end, cap)
    val_cap = compact(vsum, is_end, cap)
    return ESCResult(cptr=cptr, crow_nnz=crow_nnz, col_cap=col_cap,
                     val_cap=val_cap, nnz_total=jnp.sum(contrib))
