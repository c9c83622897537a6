"""Configuration for the TPU-native MH-SpGEMM pipeline.

The reference keeps all configuration as compile-time ``#define``s and
``constexpr`` tables (``inc/common.h:7-80``).  On TPU the equivalent is a
frozen, hashable dataclass: every field participates in the jit cache key, so
flipping a flag triggers a clean recompile exactly like a ``-D`` rebuild of
the CUDA library.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# --- type choices (reference: inc/common.h:8-10) -------------------------
# VALUE_TYPE double / index int / MASK_TYPE uint32.
INDEX_DTYPE = jnp.int32
MASK_DTYPE = jnp.uint32

# Width of one mask tile: bit k of a tile's mask means column
# ``32*tilecol + k`` is nonzero (reference: inc/CSR.h:21-27).
TILE_BITS = 5
TILE_WIDTH = 1 << TILE_BITS  # 32


@dataclasses.dataclass(frozen=True)
class SpGEMMConfig:
    """Frozen pipeline configuration (hashable -> part of jit cache keys).

    Mirrors the reference's compile-time flag set (``inc/common.h``):

    * ``value_dtype``   <-> ``VALUE_TYPE`` (default double).
    * ``aat``           <-> ``AAT`` (compute C = A @ A.T instead of A @ A).
    * ``mode``          selects the engine; the reference has a single
      hash-based numeric, we expose the TPU-native strategies:
      - ``"auto"``:       pick bucketed vs blockdense per matrix by a host
                          cost model (pipeline.choose_engine).
      - ``"bucketed"``:   the general performance engine — rows binned
                          into fixed-width classes, batched in-row sorts,
                          two gathers per product (ops/bucketed.py).
      - ``"blockdense"``: MXU engine for dense-128x128-block matrices
                          (ops/blockdense.py).
      - ``"masked"``:     the MH-faithful two-stage pipeline: tile-mask
                          symbolic (OR/popcount at tile granularity) then
                          mask-guided numeric with closed-form popcount
                          destination ranks (ops/mask.py, ops/symbolic.py,
                          ops/numeric.py).
      - ``"esc"``:        flat fused expand-sort-compress fallback.
    * ``adaptive``      <-> ``ADAPTIVE_GROUPING`` (TPU analogue: the
      engine/pass-count selection driven by the work estimate, see
      ops/binning.py and pipeline.choose_engine).
    * ``check_result``  <-> ``CHECK_RESULT``.
    """

    value_dtype: str = "float64"
    mode: str = "bucketed"
    aat: bool = False
    adaptive: bool = True
    check_result: bool = False
    # Per-phase device fences for attribution (the reference brackets every
    # phase with cudaDeviceSynchronize; on this transport each fence costs
    # ~35 ms, so the default times end-to-end with ONE fence and profile
    # mode opts into exact per-phase splits).
    profile: bool = False
    # Numeric tolerance of the result comparator (reference src/CSR.cu:60).
    tolerance: float = 1e-9
    # Bucket boundaries for row binning by work estimate (TPU analogue of
    # the 13-bin tables in inc/binning.cuh; powers of two replace the prime
    # hash-table sizes because VMEM tiles are power-of-two shaped).
    bin_bounds: Tuple[int, ...] = (0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
                                   1024, 2048, 4096)
    # Bucketed engine (ops/bucketed.py): smallest row class width and the
    # per-chunk slot budget (rows_per_chunk * width <= area cap) — the
    # shared-memory-size analogue of the reference's hash capacity tables.
    # min width 2 measured best on v5e round 2 (per-slot cost dominates:
    # scircuit 124->95 ms, webbase 792->647, GAP-road 581->479,
    # wb-edu 881->742; narrow batched sorts are nearly free).
    min_bucket_width: int = 2
    bucket_area_cap: int = 1 << 23
    # The masked (MH-faithful) engine materialises product-granularity
    # streams; cap them to stay within HBM (~21 GB observed at 29M on
    # v5e) — larger streams belong to the bucketed engine.
    masked_max_products: int = 16_000_000
    # Mosaic ragged-fill expansion (ops/ragged_fill.py): "auto" lets the
    # planner pick it per row class by measured cost model (TPU only),
    # "on" forces it, "off" keeps the XLA gather expansion,
    # "interpret" forces it in Pallas interpreter mode (CPU tests).
    dma_fill: str = "auto"
    # Mosaic ESC tail (ops/esc_tail.py): run the per-chunk sort +
    # segmented accumulate + left-pack as one VMEM-resident Pallas
    # kernel instead of XLA sorts/scans, for power-of-two width classes
    # riding the f32/df32 value pipeline.  "auto" defers to the
    # measured-cost default (currently XLA: the kernel beats the XLA
    # tail per slot — ~2.1 vs 2.7 ns — only on classes that are
    # ALREADY pow2; cant real-chip A/B round 3: bumping the width grid
    # to pow2 costs more padding than the kernel saves, 1685 vs
    # 1578 ms).  "on" runs it on natural pow2 classes, "pow2"
    # additionally rounds fill-class widths up so every fill class
    # engages, "interpret" forces interpreter mode (CPU tests),
    # "off" disables.
    esc_tail: str = "auto"
    # Distributed halo transport for the ragged strategies: "xla" runs
    # lax.all_to_all on XLA's async collective streams (overlaps with
    # the local-row stage's compute — the ragged_overlap mechanism);
    # "pallas" uses the explicit double-buffered async-remote-copy
    # kernel (ops/remote_fetch.py) — one direct RDMA per destination.
    comm_backend: str = "xla"
    # Double-f32 value pipeline for float64 (ops/esc_tail.py helpers):
    # the TPU has no native f64 — XLA emulates it at ~2.3 ns/slot per
    # arithmetic pass (measured, scripts/profile_tail.py).  "auto" runs
    # the f64 engines on Dekker-split (hi, lo) f32 pairs with two-sum
    # compensated accumulation whenever the plan-time range guard
    # (esc_tail.df_range_ok) certifies the 1e-9 comparator bound
    # (reference contract /root/reference/src/CSR.cu:60); "off" keeps
    # emulated f64; "on" forces the split (tests).
    df32: str = "auto"
    # Wide-gather expansion frontend for XLA-gather row classes
    # (ops/bucketed.build_words): the B column index and value word(s)
    # of a nonzero are stored as k consecutive int32 words so ONE
    # gather index fetches all of them — XLA's TPU gather cost is
    # per-index, not per-byte (measured scripts/micro_gather.py), so
    # this collapses the 2-3 separate takes per slot into one.
    # "auto" = on for gather classes when int32 addressing allows,
    # "off" = keep the separate takes.
    wide_gather: str = "auto"
    # Grouped slice-gather for SHORT-SPAN gather classes (the
    # tiny-row/pwarp-bin specialization of the reference,
    # inc/binning.cuh:1-65, inc/numeric.cuh:66-214): the planner pads
    # every A-entry's slab span to a multiple of G and the frontend
    # issues ONE G*k-word slice gather per aligned G-block — ~G x fewer
    # gather indices on span-2-3 plans (scircuit, mac_econ, webbase...)
    # for (G-1)/2 padding slots per entry.  "auto" = planner cost model
    # picks G per class; "off" disables (G=1 everywhere).  Requires the
    # wide-gather operand; no effect when wide_gather="off".
    group_gather: str = "auto"
    # Planned VMEM frontend (ops/planned.py): host-scheduled windowed
    # gathers + static routing networks replace the per-slot XLA takes
    # (~8 ns/index on v5e) for precomputed classes whose chunk size and
    # B table fit VMEM.  "auto" = on when running on real TPU, "on"
    # forces (requires TPU), "interpret" runs the kernels interpreted
    # (CPU tests), "off" keeps the takes frontend.
    planned: str = "auto"
    # f64 block-dense pair-matmul on the MXU via the exact bf16-slice
    # Ozaki decomposition (ops/ozaki.py): "auto" engages it on TPU when
    # the plan-time error bound (ozaki.plan_ozaki_levels) certifies the
    # 1e-9 comparator contract from the operands' value ranges; "off"
    # keeps XLA's emulated-f64 batched matmul; "interpret" forces the
    # kernel in Pallas interpreter mode (CPU tests).
    ozaki: str = "auto"

    @property
    def vdtype(self):
        return jnp.dtype(self.value_dtype)


DEFAULT_CONFIG = SpGEMMConfig()
