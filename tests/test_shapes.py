"""Static-shape quantization grid + capacity-padded pipeline correctness."""

import numpy as np
import pytest

from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm, spgemm, verify
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.ops.shapes import pad1, quantize, quantize_pow2


def test_quantize_grid_values():
    assert quantize(1) == 8
    assert quantize(8) == 8
    assert quantize(9) == 10
    assert quantize(10) == 10
    assert quantize(11) == 12
    assert quantize(15) == 16
    assert quantize(16) == 16
    assert quantize(17) == 20
    assert quantize(1000) == 1024
    assert quantize(1025) == 1280


def test_quantize_monotone_and_bounded():
    prev = 0
    for n in range(1, 5000):
        q = quantize(n)
        assert q >= n
        assert q >= prev  # monotone
        assert q <= 2 * max(n, 8)  # never more than 2x waste
        prev = q


def test_quantize_small_distinct_count():
    # the point of the grid: few distinct sizes over a huge range
    sizes = {quantize(n) for n in np.unique(
        np.logspace(0, 8, 2000).astype(int))}
    assert len(sizes) < 120


def test_quantize_pow2():
    assert quantize_pow2(1) == 1
    assert quantize_pow2(3) == 4
    assert quantize_pow2(8) == 8
    assert quantize_pow2(9) == 16


def test_pad1():
    x = np.array([1, 2, 3], dtype=np.int32)
    out = pad1(x, 5, fill=7)
    assert out.tolist() == [1, 2, 3, 7, 7]
    assert pad1(x, 3) is x


@pytest.mark.parametrize("mode", ["masked", "esc"])
def test_padded_device_csr_matches_oracle(mode):
    """The pipeline on capacity-padded device arrays must give the exact
    oracle structure — padding must never leak into the result."""
    A = gen.powerlaw(157, avg_nnz=6, seed=21)  # sizes NOT on the grid
    dA = A.device(np.float64, pad=True)
    assert dA.m_pad > A.M and dA.nnz_pad > A.nnz  # padding actually happens
    C = spgemm(dA, dA, config=SpGEMMConfig(mode=mode)).host()
    assert verify(C, oracle_spgemm(A, A), raise_on_fail=False)


def test_padded_and_unpadded_agree():
    A = gen.banded(133, band=11, nnz_per_row=5, seed=22)
    cfg = SpGEMMConfig(mode="masked")
    C_pad = spgemm(A.device(np.float64, pad=True),
                   A.device(np.float64, pad=True), config=cfg).host()
    C_raw = spgemm(A.device(np.float64), A.device(np.float64),
                   config=cfg).host()
    assert C_pad.equals(C_raw, tol=1e-12)


def test_plan_capacities_shared_across_similar_matrices():
    """Two same-family matrices of nearby size must land on identical
    quantized capacities (hence identical compiled programs)."""
    from mh_spgemm_tpu.pipeline import make_plan
    A1 = gen.banded(200, band=9, nnz_per_row=5, seed=1)
    A2 = gen.banded(201, band=9, nnz_per_row=5, seed=2)
    d1 = A1.device(np.float64, pad=True)
    d2 = A2.device(np.float64, pad=True)
    assert d1.m_pad == d2.m_pad
    assert d1.nnz_pad == d2.nnz_pad
    assert make_plan(d1, d1).max_group == make_plan(d2, d2).max_group
