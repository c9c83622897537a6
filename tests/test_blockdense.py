"""MXU block-dense engine (ops/blockdense.py): planning, pattern tracking,
strip extraction, and agreement with the other engines."""

import numpy as np
import pytest

from mh_spgemm_tpu import (CSR, SpGEMMConfig, Timing, oracle_spgemm,
                           spgemm_host, verify)
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.ops.blockdense import BS, plan_blockdense
from mh_spgemm_tpu.pipeline import choose_engine, spgemm_blockdense


def _check(A, B=None):
    C = spgemm_host(A, B, config=SpGEMMConfig(mode="blockdense"))
    R = oracle_spgemm(A, B if B is not None else A)
    assert verify(C, R, tol=1e-9, raise_on_fail=False), \
        f"mismatch: nnz {C.nnz} vs {R.nnz}"
    return C


def test_banded():
    _check(gen.banded(400, band=15, nnz_per_row=8, seed=1))


def test_random_rect():
    rng = np.random.default_rng(6)
    A = CSR.from_coo(200, 300, rng.integers(0, 200, 900),
                     rng.integers(0, 300, 900), rng.standard_normal(900),
                     sum_duplicates=True)
    B = CSR.from_coo(300, 150, rng.integers(0, 300, 700),
                     rng.integers(0, 150, 700), rng.standard_normal(700),
                     sum_duplicates=True)
    _check(A, B)


def test_non_multiple_of_block():
    # m, n deliberately not multiples of 128
    _check(gen.banded(333, band=9, nnz_per_row=5, seed=2))


def test_structural_zero_kept():
    A = CSR.from_coo(2, 2, [0, 0, 1, 1], [0, 1, 0, 1],
                     [1.0, -1.0, 1.0, 1.0])
    C = _check(A)
    assert C.nnz == oracle_spgemm(A, A).nnz


def test_plan_pairs_match_block_structure():
    A = gen.diag_blocks(256, block=8, seed=5)
    plan = plan_blockdense(A.ptr, A.col, A.ptr, A.col, A.M, A.N, A.N)
    # block-diagonal matrix: blocks only on the diagonal of the block grid
    assert plan is not None
    assert plan.nab == plan.nbb
    assert plan.npairs >= plan.ncb
    assert np.all(plan.cb_i <= A.M // BS)


def test_state_reuse():
    A = gen.banded(300, band=11, nnz_per_row=6, seed=7)
    state = None
    ref = oracle_spgemm(A, A)
    for _ in range(3):
        C, state = spgemm_blockdense(A, A, timing=Timing(), state=state)
        assert verify(C.host(), ref, raise_on_fail=False)
    assert state.plan.nnz_c == ref.nnz


def test_auto_mode_selects_and_is_correct():
    A = gen.banded(400, band=15, nnz_per_row=8, seed=1)
    eng = choose_engine(A, A, SpGEMMConfig())
    assert eng in ("blockdense", "bucketed")
    C = spgemm_host(A, config=SpGEMMConfig(mode="auto"))
    assert verify(C, oracle_spgemm(A, A), raise_on_fail=False)


def test_agreement_with_bucketed():
    A = gen.powerlaw(300, avg_nnz=5, seed=9)
    C1 = spgemm_host(A, config=SpGEMMConfig(mode="blockdense"))
    C2 = spgemm_host(A, config=SpGEMMConfig(mode="bucketed"))
    assert C1.equals(C2, tol=1e-12)


def test_blockdense_empty_matrix():
    """Empty input returns the empty C instead of a plan error
    (structured-soak degenerate family regression)."""
    from mh_spgemm_tpu import CSR, SpGEMMConfig, oracle_spgemm, spgemm_host
    import numpy as np
    A = CSR.from_coo(7, 7, np.zeros(0), np.zeros(0), np.zeros(0))
    C = spgemm_host(A, None, config=SpGEMMConfig(mode="blockdense"))
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)
