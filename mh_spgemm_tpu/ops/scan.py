"""Scan / segmented-reduction primitives.

These replace three GPU mechanisms of the reference with vectorized,
XLA-tileable equivalents:

* cub ``DeviceScan::ExclusiveSum`` (``src/main.cu:55``,
  ``inc/MH_spgemm.cuh:269,:335``)  ->  :func:`exclusive_cumsum`.
* per-row reductions done by per-bin kernels with warp shuffles
  (``inc/Calculate_C_nnz.cuh:620-641``)  ->  :func:`rows_reduce_int` — an
  integer cumsum plus boundary gathers (exact under two's-complement wrap).
* shared-memory hash OR / atomicAdd accumulation within a row  ->
  :func:`seg_scan` — a Hillis–Steele *segmented* scan whose pass count is a
  static bound on the longest segment, so short segments (the common case)
  cost only a handful of vector passes.

All index math is int32 (the reference uses ``int`` throughout).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def exclusive_cumsum(x: jax.Array, dtype=None) -> jax.Array:
    """[x0, x1, ...] -> [0, x0, x0+x1, ..., total]; length n+1."""
    dtype = dtype or x.dtype
    c = jnp.cumsum(x.astype(dtype))
    return jnp.concatenate([jnp.zeros((1,), dtype), c])


def cum_at(incl_cumsum: jax.Array, idx: jax.Array) -> jax.Array:
    """Prefix sum of the underlying array up to (exclusive) position
    ``idx``, given its inclusive cumsum.  idx in [0, n]."""
    safe = jnp.maximum(idx - 1, 0)
    return jnp.where(idx > 0, incl_cumsum[safe], 0)


def rows_reduce_int(values: jax.Array, ptr: jax.Array) -> jax.Array:
    """Per-row sums of an integer stream laid out in row-major CSR order:
    ``out[i] = sum(values[ptr[i]:ptr[i+1]])``.  Exact for int dtypes (cumsum
    wraps mod 2^32; differences recover the true sub-range sum)."""
    c = jnp.cumsum(values)
    return cum_at(c, ptr[1:]) - cum_at(c, ptr[:-1])


def seg_scan(op: Callable, flags: jax.Array, values: jax.Array,
             max_seg_len: int) -> jax.Array:
    """Segmented *inclusive* scan of ``values`` under associative ``op``.

    ``flags[i]`` is True at segment starts.  ``max_seg_len`` is a static
    upper bound on segment length; the scan runs ``ceil(log2(bound))``
    Hillis–Steele passes.  Works for any dtype ``op`` supports (used with
    ``add`` for numeric accumulation and ``bitwise_or`` for symbolic mask
    OR — the reference's ``atomicAdd`` / ``atomicOr`` analogues).
    """
    n = values.shape[0]
    v = values
    f = flags
    dist = 1
    while dist < max_seg_len and dist < n:
        sv = jnp.concatenate([v[:dist], v[:-dist]])  # value ignored when sf
        sf = jnp.concatenate([jnp.ones((dist,), dtype=bool), f[:-dist]])
        v = jnp.where(f, v, op(sv, v))
        f = f | sf
        dist *= 2
    return v


def seg_sum_at_runs(values: jax.Array, run_starts: jax.Array,
                    max_seg_len: int) -> jax.Array:
    """Inclusive segmented sum; read the result at run ends to obtain
    per-run totals."""
    return seg_scan(jnp.add, run_starts, values, max_seg_len)


def compact(values: jax.Array, flags: jax.Array, out_size: int,
            fill=0) -> jax.Array:
    """Stream compaction: gather ``values[flags]`` into a static-size array.

    ``out_size`` must equal (or exceed) the true number of set flags; the
    tail is ``fill``.  Implemented as a unique-index scatter (positions are
    the cumsum of flags), which XLA lowers without sorting.
    """
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    idx = jnp.where(flags, pos, out_size)
    out = jnp.full((out_size,), fill, dtype=values.dtype)
    return out.at[idx].set(values, mode="drop", unique_indices=True)


def compact_multi(arrays, flags: jax.Array, out_size: int):
    """Compact several same-length arrays with one shared flag stream."""
    return tuple(compact(a, flags, out_size) for a in arrays)
