"""Exact bf16-slice f64 pair-matmul (ops/ozaki.py) in interpreter mode:
slicing exactness, the kernel against numpy f64, the plan-time error
bound, and the block-dense engine end-to-end riding it (the f64 MXU
path, VERDICT round-2 missing #1; reference dtype contract
/root/reference/inc/common.h:8)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mh_spgemm_tpu import (CSR, SpGEMMConfig, oracle_spgemm, spgemm_host,
                           verify)
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.ops.ozaki import (BS, pair_matmul_f64_ozaki,
                                     plan_ozaki_levels, slice_blocks)


def _rand_blocks(nblk, rng, scale_spread=0.0):
    v = rng.standard_normal((nblk, BS, BS))
    if scale_spread:
        v = v * np.exp2(rng.uniform(-scale_spread, scale_spread,
                                    (nblk, BS, BS)))
    return v


def test_slice_exactness():
    rng = np.random.default_rng(0)
    d = _rand_blocks(3, rng, scale_spread=20.0)
    S = 6
    sl = np.asarray(slice_blocks(jnp.asarray(d), nslices=S,
                                 contract_axis=2), np.float64)
    # each slice survives the bf16 round-trip by construction
    assert sl.dtype == np.float64
    recon = sl.sum(axis=1)
    sigma = np.exp2(np.ceil(np.log2(np.abs(d).max(axis=2,
                                           keepdims=True) + 1e-300)))
    assert np.all(np.abs(d - recon) <= sigma * 2.0 ** (-8 * S) + 1e-300)


def test_slice_zero_rows():
    d = np.zeros((1, BS, BS))
    d[0, 5, :] = 1.0  # one live row, the rest all-zero lines
    sl = np.asarray(slice_blocks(jnp.asarray(d), nslices=4,
                                 contract_axis=2), np.float64)
    assert np.all(np.isfinite(sl))
    assert np.allclose(sl.sum(axis=1), d)


def test_plan_levels():
    # O(1) values, short segments: the cheap end of the ladder
    assert plan_ozaki_levels(1.0, 1.0, 16) <= 6
    # zero operands: trivially certifiable
    assert plan_ozaki_levels(0.0, 1.0, 16) == 4
    # value ranges whose systematic truncation bias cannot certify the
    # absolute arm fall back to emulated f64 — no relative escape hatch
    # (cancellation soundness; see plan_ozaki_levels docstring)
    assert plan_ozaki_levels(1e200, 1e200, 16) is None
    assert plan_ozaki_levels(float("nan"), 1.0, 16) is None
    assert plan_ozaki_levels(1e4, 1e4, 1024) is None
    # moderate ranges climb the slice ladder instead
    S = plan_ozaki_levels(30.0, 30.0, 256)
    assert S is not None and S >= plan_ozaki_levels(1.0, 1.0, 16)


@pytest.mark.parametrize("spread", [0.0, 4.0])
def test_kernel_vs_numpy(spread):
    rng = np.random.default_rng(42)
    nab, nbb = 4, 5
    a = _rand_blocks(nab, rng, spread)
    b = _rand_blocks(nbb, rng, spread)
    # pair stream with segments of length 1..3, plus one padding pair
    pair_a = np.array([0, 1, 2, 3, 0, 1, 2, 0], np.int32)
    pair_b = np.array([0, 1, 2, 3, 4, 0, 1, 0], np.int32)
    pair_cb = np.array([0, 0, 0, 1, 1, 2, 3, 3], np.int32)
    live = np.array([1, 1, 1, 1, 1, 1, 1, 0], bool)
    ncb = 4
    S = plan_ozaki_levels(float(np.abs(a).max()), float(np.abs(b).max()),
                          max_seg_pairs=4)
    assert S is not None
    a_sl = slice_blocks(jnp.asarray(a), nslices=S, contract_axis=2)
    b_sl = slice_blocks(jnp.asarray(b), nslices=S, contract_axis=1)
    got = np.asarray(pair_matmul_f64_ozaki(
        a_sl, b_sl, jnp.asarray(pair_a), jnp.asarray(pair_b),
        jnp.asarray(pair_cb), jnp.asarray(live), ncb=ncb, nslices=S,
        interpret=True))
    want = np.zeros((ncb, BS, BS))
    for g in range(len(pair_a)):
        if live[g]:
            want[pair_cb[g]] += a[pair_a[g]] @ b[pair_b[g]]
    # certified: systematic terms <= 1e-10 absolute, TwoSum rounding
    # <= ~1e-11 relative to each element
    bad = np.abs(got - want) > 1e-10 + 1e-10 * np.abs(want)
    assert not bad.any(), f"max err {np.abs(got - want).max()}"


def test_blockdense_engine_ozaki_end_to_end():
    A = gen.banded(300, band=11, nnz_per_row=6, seed=3)
    cfg = SpGEMMConfig(mode="blockdense", ozaki="interpret")
    C = spgemm_host(A, A, config=cfg)
    R = oracle_spgemm(A, A)
    assert verify(C, R, tol=1e-9, raise_on_fail=False)


def test_blockdense_engine_ozaki_wide_range_falls_back():
    """Values spanning ~12 decades: the systematic-bias bound cannot
    certify 1e-9 (cancellation regression — an earlier draft certified
    relative to the product scale and broke exactly here), so the plan
    must fall back to the emulated-f64 matmul and stay correct."""
    from mh_spgemm_tpu.pipeline import spgemm_blockdense
    rng = np.random.default_rng(9)
    A = gen.banded(256, band=7, nnz_per_row=5, seed=4)
    val = np.asarray(A.val) * np.exp2(rng.uniform(-20, 20, A.nnz))
    A = CSR(M=A.M, N=A.N, ptr=A.ptr, col=A.col, val=val)
    cfg = SpGEMMConfig(mode="blockdense", ozaki="interpret")
    C, state = spgemm_blockdense(A, A, config=cfg)
    assert state.plan.ozaki_slices is None
    R = oracle_spgemm(A, A)
    assert verify(C.host(), R, tol=1e-9, raise_on_fail=False)


def test_blockdense_mosaic_extraction():
    """Block-dense strips through the shared Mosaic extraction
    (ops/bucketed.build_extract_plan + bucketed_extract_mosaic), forced
    in interpreter mode, both value dtypes."""
    from mh_spgemm_tpu.pipeline import spgemm_blockdense
    A = gen.banded(300, band=11, nnz_per_row=6, seed=7)
    ref = oracle_spgemm(A, A)
    for dtype in ("float64", "float32"):
        cfg = SpGEMMConfig(mode="blockdense", value_dtype=dtype,
                           ozaki="off", dma_fill="interpret")
        state = None
        for _ in range(2):
            C, state = spgemm_blockdense(A, A, config=cfg, state=state)
            assert verify(C.host(), ref,
                          tol=1e-9 if dtype == "float64" else 1e-4,
                          raise_on_fail=False), dtype
        assert state.plan.ext is not None


def test_blockdense_engine_ozaki_state_reuse():
    from mh_spgemm_tpu.pipeline import spgemm_blockdense
    A = gen.banded(300, band=11, nnz_per_row=6, seed=7)
    cfg = SpGEMMConfig(mode="blockdense", ozaki="interpret")
    ref = oracle_spgemm(A, A)
    state = None
    for _ in range(3):
        C, state = spgemm_blockdense(A, A, config=cfg, state=state)
        assert verify(C.host(), ref, raise_on_fail=False)
    assert state.plan.ozaki_slices is not None
