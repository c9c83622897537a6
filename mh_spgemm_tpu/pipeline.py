"""Pipeline driver: the TPU equivalent of ``MH_spgemm()``
(``src/main.cu:12-72``) plus the workspace manager (``Tool``,
``src/Tool.cu:4-73``).

Phases (same seven-phase accounting as the reference's ``Timing``):

1. mem_alloc            — plan lookup / H2D of operands.
2. Form_mask_matrix_B   — tile counts, mask compaction, flop upper bound
                          (excluded from the SpGEMM total, like the
                          reference — src/Timing.cpp:39-42).
3. symbolic_binning     — bucketed row dispatch by flop estimate.
4. Calculate_C_nnz      — tile-granularity sort + segmented OR + popcount.
5. Malloc_C_col_val     — row-pointer scan + nnz(C)/tile-count readback
                          (the host-device sync the reference also pays,
                          src/main.cu:56).
6. numeric_binning      — bucketed row dispatch by exact nnz.
7. Numeric              — mask-guided scatter accumulation (or fused ESC).

The host readbacks between jits feed *static shapes* of the downstream
kernels; re-running the same matrix hits the jit cache, which is the TPU
analogue of the reference reusing its preallocated ``Tool`` workspace.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, SpGEMMConfig
from .csr import CSR, DeviceCSR
from .errors import ShapeMismatchError, SpGEMMError, require
from .ops import binning as binning_ops
from .ops import mask as mask_ops
from .ops import numeric as numeric_ops
from .ops import symbolic as symbolic_ops
from .timing import PhaseTimer, Timing

_INT32_MAX = 2**31 - 1


@dataclasses.dataclass
class SpGEMMPlan:
    """Host-side static sizes discovered during a run (workspace analogue).

    Caching a plan lets later iterations of the same problem skip nothing
    device-side but reuse every compiled kernel, like the reference's
    ``Tool`` keeps its combined allocation across iterations.
    """

    m: int
    n: int
    nnz_a: int
    nnz_b: int
    max_group: int
    total_tiles: Optional[int] = None
    t_prime: Optional[int] = None
    intprod: Optional[int] = None
    nnz_c: Optional[int] = None
    tc: Optional[int] = None


def spgemm(A: DeviceCSR, B: DeviceCSR,
           config: SpGEMMConfig = DEFAULT_CONFIG,
           timing: Optional[Timing] = None,
           plan: Optional[SpGEMMPlan] = None) -> DeviceCSR:
    """Compute C = A @ B on device.  Returns a DeviceCSR with exact-size
    arrays (ptr int32[M+1], col int32[nnzC], val float[nnzC], columns
    sorted ascending within each row)."""
    require(A.N == B.M, ShapeMismatchError, "A.N must equal B.M")
    timing = timing if timing is not None else Timing()
    if config.mode == "masked":
        return _spgemm_masked(A, B, config, timing, plan)
    elif config.mode == "esc":
        return _spgemm_esc(A, B, config, timing, plan)
    raise SpGEMMError(f"unknown mode {config.mode!r}")


def make_plan(A: DeviceCSR, B: DeviceCSR) -> SpGEMMPlan:
    a_row_nnz = np.asarray(A.ptr[1:] - A.ptr[:-1])
    max_group = int(a_row_nnz.max()) if a_row_nnz.size else 1
    return SpGEMMPlan(m=A.M, n=B.N, nnz_a=A.nnz, nnz_b=B.nnz,
                      max_group=max(1, max_group))


def _fence(*arrays) -> None:
    """Phase fence — the ``cudaDeviceSynchronize`` analogue."""
    for a in arrays:
        a.block_until_ready()


def _empty_c(A: DeviceCSR, B: DeviceCSR, config) -> DeviceCSR:
    return DeviceCSR(M=A.M, N=B.N,
                     ptr=jnp.zeros((A.M + 1,), jnp.int32),
                     col=jnp.zeros((0,), jnp.int32),
                     val=jnp.zeros((0,), config.vdtype))


def _spgemm_masked(A: DeviceCSR, B: DeviceCSR, config: SpGEMMConfig,
                   timing: Timing, plan: Optional[SpGEMMPlan]) -> DeviceCSR:
    with PhaseTimer.phase(timing, "mem_alloc"):
        if plan is None:
            plan = make_plan(A, B)
        a_val = A.val.astype(config.vdtype)
        b_val = B.val.astype(config.vdtype)
        _fence(A.ptr, B.ptr)

    if A.nnz == 0 or B.nnz == 0:
        return _empty_c(A, B, config)

    # -- Form_mask_matrix_B (reported separately; excluded from total) ----
    with PhaseTimer.phase(timing, "form_mask_matrix_b"):
        tiles_per_row, total_t = mask_ops.count_tiles(
            B.ptr, B.col, B.M, B.nnz)
        plan.total_tiles = int(total_t)          # readback (MH_spgemm.cuh:271)
        mask = mask_ops.form_mask_matrix(B.ptr, B.col, B.M, B.nnz,
                                         plan.total_tiles)
        fub_row = mask_ops.flops_upper_bound(A.ptr, A.col, tiles_per_row,
                                             A.nnz)
        t_prime = int(jnp.sum(fub_row))
        plan.t_prime = t_prime
        require(t_prime < _INT32_MAX, SpGEMMError,
                "symbolic stream exceeds int32; use the chunked pipeline")
        _fence(mask.tilemask, fub_row)

    if t_prime == 0:
        timing.calculate_c_nnz += 0.0
        return _empty_c(A, B, config)

    # -- symbolic binning (flop estimate, TYPE 2) --------------------------
    with PhaseTimer.phase(timing, "symbolic_binning"):
        sym_bins = binning_ops.bin_rows(fub_row, config.bin_bounds)
        _fence(sym_bins.rows_by_bin)

    # -- Calculate_C_nnz ---------------------------------------------------
    with PhaseTimer.phase(timing, "calculate_c_nnz"):
        sym = symbolic_ops.symbolic(A.ptr, A.col, mask, A.M, A.nnz,
                                    t_prime, plan.max_group)
        _fence(sym.crow_nnz)

    # -- Malloc_C_col_val: scans + scalar readbacks ------------------------
    with PhaseTimer.phase(timing, "malloc_c_col_val"):
        plan.nnz_c = int(jnp.sum(sym.crow_nnz))
        plan.tc = int(jnp.sum(sym.ctiles_row))

    if plan.nnz_c == 0:
        return _empty_c(A, B, config)

    # -- numeric binning (exact nnz, TYPE 4) -------------------------------
    with PhaseTimer.phase(timing, "numeric_binning"):
        num_bins = binning_ops.bin_rows(sym.crow_nnz, config.bin_bounds)
        _fence(num_bins.rows_by_bin)

    # -- Numeric ------------------------------------------------------------
    with PhaseTimer.phase(timing, "numeric"):
        cs = symbolic_ops.c_structure(sym, A.M, plan.tc, plan.nnz_c)
        if plan.intprod is None:
            blens = B.ptr[A.col + 1] - B.ptr[A.col]
            plan.intprod = int(jnp.sum(blens.astype(jnp.int64)))
        require(plan.intprod < _INT32_MAX, SpGEMMError,
                "product stream exceeds int32; use the chunked pipeline")
        cval = numeric_ops.numeric_masked(
            A.ptr, A.col, a_val, B.ptr, B.col, b_val, mask, sym, cs,
            A.nnz, plan.intprod, plan.nnz_c)
        _fence(cval)

    return DeviceCSR(M=A.M, N=B.N, ptr=cs.cptr, col=cs.ccol, val=cval)


def _spgemm_esc(A: DeviceCSR, B: DeviceCSR, config: SpGEMMConfig,
                timing: Timing, plan: Optional[SpGEMMPlan]) -> DeviceCSR:
    """Fused expand-sort-compress mode: no mask matrix, one sort at column
    granularity.  Robust fallback + differential check for 'masked'."""
    with PhaseTimer.phase(timing, "mem_alloc"):
        if plan is None:
            plan = make_plan(A, B)
        a_val = A.val.astype(config.vdtype)
        b_val = B.val.astype(config.vdtype)
        _fence(A.ptr, B.ptr)

    if A.nnz == 0 or B.nnz == 0:
        return _empty_c(A, B, config)

    with PhaseTimer.phase(timing, "symbolic_binning"):
        if plan.intprod is None:
            blens = B.ptr[A.col + 1] - B.ptr[A.col]
            plan.intprod = int(jnp.sum(blens.astype(jnp.int64)))
        require(plan.intprod < _INT32_MAX, SpGEMMError,
                "product stream exceeds int32; use the chunked pipeline")

    if plan.intprod == 0:
        return _empty_c(A, B, config)

    with PhaseTimer.phase(timing, "numeric"):
        cap = plan.nnz_c if plan.nnz_c is not None else plan.intprod
        res = numeric_ops.numeric_esc(
            A.ptr, A.col, a_val, B.ptr, B.col, b_val,
            A.M, A.nnz, plan.intprod, cap, plan.max_group)
        _fence(res.nnz_total)

    with PhaseTimer.phase(timing, "malloc_c_col_val"):
        nnz_c = int(res.nnz_total)
        plan.nnz_c = nnz_c
        cptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(res.crow_nnz)]).astype(jnp.int32)
        col = res.col_cap[:nnz_c]
        val = res.val_cap[:nnz_c]
        _fence(col)

    return DeviceCSR(M=A.M, N=B.N, ptr=cptr, col=col, val=val)


def spgemm_host(A: CSR, B: Optional[CSR] = None,
                config: SpGEMMConfig = DEFAULT_CONFIG,
                timing: Optional[Timing] = None) -> CSR:
    """Host-convenience wrapper: CSR in, CSR out (H2D + pipeline + D2H).

    ``B=None`` computes C = A @ A (or A @ A^T under ``config.aat``,
    reference src/main.cu:98-101)."""
    if B is None:
        B = A.transpose() if (config.aat and not A.is_symmetric) else A
    dA = A.device(config.vdtype)
    dB = B.device(config.vdtype)
    C = spgemm(dA, dB, config=config, timing=timing)
    return C.host()
