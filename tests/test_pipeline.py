"""End-to-end pipeline correctness vs the scipy oracle — the TPU analogue of
the reference's CHECK_RESULT differential test (src/main.cu:187-199)."""

import numpy as np
import pytest

from mh_spgemm_tpu import (SpGEMMConfig, Timing, oracle_spgemm, spgemm_host,
                           verify)
from mh_spgemm_tpu.bench import gen

MODES = ("masked", "esc", "bucketed")


def _run(A, B=None, mode="masked"):
    cfg = SpGEMMConfig(mode=mode)
    C = spgemm_host(A, B, config=cfg)
    C_ref = oracle_spgemm(A, B if B is not None else A)
    assert verify(C, C_ref, tol=1e-9, raise_on_fail=False), \
        f"mode={mode} mismatch: nnz {C.nnz} vs {C_ref.nnz}"
    return C


@pytest.mark.parametrize("mode", MODES)
def test_tiny_fixture(mode):
    _run(gen.tiny_fixture(), mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_banded(mode):
    _run(gen.banded(200, band=12, nnz_per_row=6, seed=1), mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_random(mode):
    _run(gen.random_uniform(150, nnz_per_row=5, seed=2), mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_powerlaw(mode):
    _run(gen.powerlaw(300, avg_nnz=5, seed=3), mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_kron(mode):
    _run(gen.kron(scale=8, edge_factor=4, seed=4), mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_diag_blocks(mode):
    _run(gen.diag_blocks(128, block=8, seed=5), mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_rectangular_ab(mode):
    rng = np.random.default_rng(6)
    from mh_spgemm_tpu import CSR
    A = CSR.from_coo(50, 80, rng.integers(0, 50, 300),
                     rng.integers(0, 80, 300), rng.standard_normal(300),
                     sum_duplicates=True)
    B = CSR.from_coo(80, 30, rng.integers(0, 80, 200),
                     rng.integers(0, 30, 200), rng.standard_normal(200),
                     sum_duplicates=True)
    cfg = SpGEMMConfig(mode=mode)
    C = spgemm_host(A, B, config=cfg)
    assert verify(C, oracle_spgemm(A, B), raise_on_fail=False)


@pytest.mark.parametrize("mode", MODES)
def test_empty_matrix(mode):
    from mh_spgemm_tpu import CSR
    A = CSR.from_coo(10, 10, [], [], [])
    C = spgemm_host(A, config=SpGEMMConfig(mode=mode))
    assert C.nnz == 0 and C.ptr.tolist() == [0] * 11


@pytest.mark.parametrize("mode", MODES)
def test_single_entry(mode):
    from mh_spgemm_tpu import CSR
    A = CSR.from_coo(4, 4, [1], [2], [3.0])
    B = CSR.from_coo(4, 4, [2], [0], [2.0])
    C = spgemm_host(A, B, config=SpGEMMConfig(mode=mode))
    assert verify(C, oracle_spgemm(A, B), raise_on_fail=False)


def test_aat_mode():
    A = gen.banded(100, band=7, nnz_per_row=4, seed=7)
    cfg = SpGEMMConfig(mode="masked", aat=True)
    C = spgemm_host(A, config=cfg)
    C_ref = oracle_spgemm(A, A.transpose())
    assert verify(C, C_ref, raise_on_fail=False)


def test_timing_populated():
    t = Timing()
    spgemm_host(gen.tiny_fixture(), config=SpGEMMConfig(mode="masked"),
                timing=t)
    assert t.calculate_c_nnz >= 0 and t.numeric > 0
    assert t.total() > 0
    # mask build excluded from total (reference src/Timing.cpp:39-42)
    assert abs(t.total() - (t.mem_alloc + t.symbolic_binning +
                            t.calculate_c_nnz + t.malloc_c_col_val +
                            t.numeric_binning + t.numeric)) < 1e-9


def test_cancellation_keeps_explicit_zero():
    """Numerical cancellation must keep the structural nonzero (hash tables
    in the reference store every touched column)."""
    from mh_spgemm_tpu import CSR
    A = CSR.from_coo(2, 2, [0, 0, 1, 1], [0, 1, 0, 1],
                     [1.0, -1.0, 1.0, 1.0])
    C = spgemm_host(A, config=SpGEMMConfig(mode="masked"))
    C_ref = oracle_spgemm(A, A)
    assert C.nnz == C_ref.nnz
    assert verify(C, C_ref, raise_on_fail=False)


@pytest.mark.parametrize("mode", MODES)
def test_float32_mode(mode):
    A = gen.banded(100, band=9, nnz_per_row=5, seed=8)
    cfg = SpGEMMConfig(mode=mode, value_dtype="float32", tolerance=1e-4)
    C = spgemm_host(A, config=cfg)
    C_ref = oracle_spgemm(A, A)
    assert verify(C, C_ref, tol=1e-4, raise_on_fail=False)


def test_modes_agree():
    # min_bucket_width=8 keeps the masked engine's class count (= CPU
    # compile count) small; correctness is width-independent
    A = gen.powerlaw(200, avg_nnz=6, seed=9)
    C1 = spgemm_host(A, config=SpGEMMConfig(mode="masked",
                                            min_bucket_width=8))
    C2 = spgemm_host(A, config=SpGEMMConfig(mode="esc"))
    assert C1.equals(C2, tol=1e-12)


def test_device_spgemm_default_config():
    """spgemm(dA, dB) must work under DEFAULT_CONFIG (host-planned modes
    are served by the fused ESC device engine; regression for ADVICE.md)."""
    from mh_spgemm_tpu import DEFAULT_CONFIG
    from mh_spgemm_tpu.pipeline import spgemm as device_spgemm
    A = gen.banded(60, band=5, nnz_per_row=4, seed=41)
    dA = A.device(DEFAULT_CONFIG.vdtype, pad=True)
    C = device_spgemm(dA, dA)
    assert C.host().equals(oracle_spgemm(A, A), tol=1e-9)


def test_chunked_retries_on_planner_overflow(monkeypatch):
    """A chunk under the raw-product budget whose PADDED slab overflows
    must be split and retried, not crash (ADVICE.md medium)."""
    import mh_spgemm_tpu.pipeline as pl_mod
    A = gen.random_uniform(128, nnz_per_row=4, seed=55)
    real = pl_mod.spgemm_bucketed
    calls = {"n": 0}

    def flaky(sub, B, **kw):
        calls["n"] += 1
        if calls["n"] == 1 and sub.M > 32:
            raise ValueError("padded slab area exceeds int32 (simulated)")
        return real(sub, B, **kw)

    monkeypatch.setattr(pl_mod, "spgemm_bucketed", flaky)
    C = pl_mod.spgemm_chunked(A, A, max_products=1 << 20)
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)
    assert calls["n"] >= 3      # the failed chunk re-ran as two halves


def test_masked_classes_no_product_cap():
    """The class-based masked engine has no masked_max_products cap:
    a stream larger than a tiny cap still runs (VERDICT item 6)."""
    from mh_spgemm_tpu.pipeline import spgemm_masked
    A = gen.banded(300, band=14, nnz_per_row=10, seed=13)
    assert A.intprod(A) > 16_000     # over a 16k cap stand-in
    cfg = SpGEMMConfig(mode="masked", masked_max_products=16_000)
    C, st = spgemm_masked(A, A, config=cfg)
    assert C.host().equals(oracle_spgemm(A, A), tol=1e-9)
    # warm state reuse
    C2, _ = spgemm_masked(A, A, config=cfg, state=st)
    assert C2.host().equals(oracle_spgemm(A, A), tol=1e-9)


def test_masked_classes_f32_and_rect():
    from mh_spgemm_tpu import CSR
    from mh_spgemm_tpu.pipeline import spgemm_masked
    rng = np.random.default_rng(77)
    A = CSR.from_coo(80, 120, rng.integers(0, 80, 400),
                     rng.integers(0, 120, 400),
                     rng.standard_normal(400), sum_duplicates=True)
    B = CSR.from_coo(120, 60, rng.integers(0, 120, 500),
                     rng.integers(0, 60, 500),
                     rng.standard_normal(500), sum_duplicates=True)
    C, _ = spgemm_masked(A, B, config=SpGEMMConfig(mode="masked",
                                                   value_dtype="float32"))
    assert C.host().equals(oracle_spgemm(A, B), tol=1e-4)


def test_masked_classes_fill_frontend():
    """Masked engine with the Mosaic ragged-fill product frontend
    (interpreter mode): exact match incl. the tile-rank destinations."""
    from mh_spgemm_tpu.pipeline import spgemm_masked
    A = gen.banded(150, band=10, nnz_per_row=8, seed=5)
    cfg = SpGEMMConfig(mode="masked", dma_fill="interpret",
                       min_bucket_width=16)
    C, st = spgemm_masked(A, A, config=cfg)
    assert any(c.fill for c in st.plan.classes)
    assert C.host().equals(oracle_spgemm(A, A), tol=1e-9)
