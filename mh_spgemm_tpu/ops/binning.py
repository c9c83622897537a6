"""Row binning / bucketed dispatch.

The reference histograms every row into one of 13 bins by work estimate and
launches a specialised kernel per bin on its own CUDA stream
(``inc/binning.cuh:1-155``, ``inc/MH_spgemm.cuh:26-43``).  On TPU the roles
change:

* *Whole-matrix vectorized paths* (the default pipeline) don't need per-row
  kernels — XLA tiles one fixed-shape program over the full stream.
* Binning instead drives (a) **strategy selection** (the adaptive-grouping
  analogue: pick 'masked' vs 'esc' numeric and scan pass-counts from the
  work distribution — reference ``inc/Calculate_C_nnz.cuh:47-87``), (b)
  **bucketed Pallas kernels** (rows grouped by size class so each bucket
  gets a fixed-shape VMEM hash/merge kernel), and (c) telemetry.

``bin_rows`` is the two-kernel histogram+scatter (``k_binning1`` /
``k_binning2``) as one vector op: a digitize + stable sort by bin id.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Binning(NamedTuple):
    bin_of_row: jax.Array   # int32[M] bin index per row
    bin_size: jax.Array     # int32[NBINS]
    bin_offset: jax.Array   # int32[NBINS+1] exclusive scan of sizes
    rows_by_bin: jax.Array  # int32[M] row ids grouped by bin (like d_bins)
    max_work: jax.Array     # int32[]  max per-row work (atomicMax analogue)


@functools.partial(jax.jit, static_argnames=("bounds",))
def bin_rows(work: jax.Array, bounds: Tuple[int, ...]) -> Binning:
    """Assign each row to a bin by its work estimate.

    ``bounds`` are ascending inclusive upper bounds for bins 0..len-1; work
    above the last bound lands in the overflow bin (the reference's
    global-memory bin 10..12).  Matches ``get_range<TYPE>`` semantics
    (inc/binning.cuh:1-65) with boundaries as config, not five hard-coded
    tables.
    """
    b = jnp.asarray(np.asarray(bounds, dtype=np.int32))
    bin_of_row = jnp.searchsorted(b, work, side="left").astype(jnp.int32)
    nbins = len(bounds) + 1
    bin_size = jnp.zeros((nbins,), jnp.int32).at[bin_of_row].add(1)
    bin_offset = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bin_size)])
    m = work.shape[0]
    # scatter rows grouped by bin: stable sort by bin id carries row ids
    _, rows_by_bin = jax.lax.sort(
        (bin_of_row, jnp.arange(m, dtype=jnp.int32)), num_keys=1,
        is_stable=True)
    return Binning(bin_of_row=bin_of_row, bin_size=bin_size,
                   bin_offset=bin_offset, rows_by_bin=rows_by_bin,
                   max_work=jnp.max(work) if m else jnp.int32(0))


def group_size(flop: int, nnz_arow: int, block: int = 512) -> int:
    """Adaptive-grouping heuristic of the reference
    (``inc/Calculate_C_nnz.cuh:47-87``): threads cooperating per A-row
    entry, ``clamp(round_pow2(flop / nnz), <= block)``.  On TPU the value
    parameterises segmented-scan pass counts and bucket tile widths."""
    if nnz_arow <= 0:
        return 1
    g = _round_pow2(max(1, flop // max(1, nnz_arow)))
    g = min(g, block)
    while g < block and (block // g) * 2 > max(1, nnz_arow):
        g *= 2
    return g


def _round_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def scan_passes(max_group: int) -> int:
    """Hillis–Steele pass count needed for segments up to ``max_group``."""
    return max(0, int(max_group - 1).bit_length())
