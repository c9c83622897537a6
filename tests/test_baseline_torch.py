"""torch-cpu vendor-engine baseline (the CUSPARSE analogue,
inc/cusparse_spgemm.cuh:6-106): independent SpGEMM implementation used
for differential testing and as a timing comparison point."""

import numpy as np
import pytest

from mh_spgemm_tpu import oracle_spgemm
from mh_spgemm_tpu.baseline import torch_spgemm
from mh_spgemm_tpu.bench import gen

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("make", [
    lambda: gen.tiny_fixture(),
    lambda: gen.banded(200, band=12, nnz_per_row=6, seed=1),
    lambda: gen.powerlaw(300, avg_nnz=5, seed=3),
])
def test_torch_matches_scipy_structure_and_values(make):
    A = make()
    C_t, ms = torch_spgemm(A, A)
    C_o = oracle_spgemm(A, A)
    assert ms >= 0.0
    # torch prunes exact-zero cancellations (like raw scipy); on these
    # random-valued matrices cancellation is measure-zero, so structures
    # must agree exactly and values to fp64 roundoff
    assert C_t.nnz == C_o.nnz
    assert np.array_equal(C_t.ptr, C_o.ptr)
    assert np.array_equal(C_t.col, C_o.col)
    np.testing.assert_allclose(C_t.val, C_o.val, rtol=1e-12, atol=1e-14)


def test_torch_column_order_sorted():
    A = gen.powerlaw(150, avg_nnz=4, seed=9)
    C_t, _ = torch_spgemm(A, A)
    rows = np.repeat(np.arange(C_t.M), np.diff(C_t.ptr))
    d = np.diff(C_t.col)
    inside = rows[1:] == rows[:-1]
    assert (d[inside] > 0).all()      # strictly ascending within rows
