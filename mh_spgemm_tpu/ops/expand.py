"""Gather-expansion of CSR row references — the core streaming primitive.

The reference's kernels walk ``A(i,:)`` and, per nonzero, stride the
referenced B row with a thread group (``inc/numeric.cuh:215-258``,
``inc/Calculate_C_nnz.cuh`` hot loops).  The TPU-native equivalent
materialises that traversal as one flat, statically-sized stream:

    for each A-nonzero e (in CSR order), emit the ``lens[e]`` consecutive
    items of the referenced B-row segment.

The stream is ordered by C row (A is CSR-ordered), which every later stage
exploits: per-row reductions become boundary gathers and sorting only needs
``(row, key)`` lexicographic ordering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .scan import exclusive_cumsum


class Expansion(NamedTuple):
    """A flattened segment expansion of total static length P."""

    seg_id: jax.Array   # int32[P]  which source element each slot came from
    offset: jax.Array   # int32[P]  position within the source segment
    starts: jax.Array   # int32[E+1] exclusive cumsum of segment lengths


def expand_segments(lens: jax.Array, total: int) -> Expansion:
    """Expand ``E`` segments of host-unknown lengths ``lens`` (summing to
    the static ``total``) into a flat stream of (segment id, offset).

    Zero-length segments are skipped.  If ``sum(lens) < total`` the tail
    repeats the last segment id with growing offsets (callers mask by
    comparing against ``starts``).
    """
    E = lens.shape[0]
    starts = exclusive_cumsum(lens, dtype=jnp.int32)
    seg_id = jnp.repeat(jnp.arange(E, dtype=jnp.int32), lens,
                        total_repeat_length=total)
    offset = jnp.arange(total, dtype=jnp.int32) - starts[seg_id]
    return Expansion(seg_id=seg_id, offset=offset, starts=starts)


def row_ids(ptr: jax.Array, nnz: int) -> jax.Array:
    """Row index of every CSR nonzero: expand ``diff(ptr)`` over nnz."""
    lens = ptr[1:] - ptr[:-1]
    return jnp.repeat(jnp.arange(ptr.shape[0] - 1, dtype=jnp.int32), lens,
                      total_repeat_length=nnz)


class ProductStream(NamedTuple):
    """The intermediate-product stream of C = A @ B at some granularity.

    ``crow``  int32[P]: C row of each product (nondecreasing).
    ``src``   int32[P]: index into the B-side payload arrays.
    ``a_idx`` int32[P]: index of the originating A nonzero.
    ``valid`` bool[P]:  False for padding slots.
    """

    crow: jax.Array
    src: jax.Array
    a_idx: jax.Array
    valid: jax.Array


def expand_products(a_ptr: jax.Array, a_col: jax.Array,
                    b_seg_ptr: jax.Array, total: int,
                    nnz_a: int) -> ProductStream:
    """Build the product stream: for each A-nonzero e with column k, emit
    indices ``b_seg_ptr[k] .. b_seg_ptr[k+1]-1`` tagged with e's row.

    ``b_seg_ptr`` is B's row pointer for column-granularity expansion
    (numeric stage) or the mask matrix's ``tileptr`` for tile-granularity
    expansion (symbolic stage) — one primitive serves both, mirroring how
    the reference reuses its traversal in ``Calculate_C_tilePtr`` and
    ``h_numeric``.
    """
    starts = b_seg_ptr[a_col]
    lens = b_seg_ptr[a_col + 1] - starts                  # int32[nnzA]
    # pad-safety: A nonzeros beyond ptr[-1] are capacity padding — they
    # reference B row 0 but must contribute no products.
    return expand_products_sl(a_ptr, a_col, starts, lens, total, nnz_a,
                              a_nnz_valid=a_ptr[-1])


def expand_products_sl(a_ptr: jax.Array, a_col: jax.Array,
                       b_starts: jax.Array, b_lens: jax.Array,
                       total: int, nnz_a: int,
                       a_nnz_valid: jax.Array | None = None
                       ) -> ProductStream:
    """Generalised product expansion with explicit per-A-nonzero segment
    (start, length) — used by the distributed path where gathered remote B
    blocks are not contiguous in one CSR array.  ``a_nnz_valid`` masks
    padded A nonzeros (distributed shards pad to a common capacity)."""
    if a_nnz_valid is not None:
        keep = jnp.arange(nnz_a, dtype=jnp.int32) < a_nnz_valid
        b_lens = jnp.where(keep, b_lens, 0)
    ex = expand_segments(b_lens, total)
    a_rows = row_ids(a_ptr, nnz_a)                        # int32[nnzA]
    crow = a_rows[ex.seg_id]
    src = b_starts[ex.seg_id] + ex.offset
    valid = jnp.arange(total, dtype=jnp.int32) < ex.starts[-1]
    return ProductStream(crow=crow, src=src, a_idx=ex.seg_id, valid=valid)
