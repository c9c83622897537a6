"""CSR container, transpose, comparator (reference CSR.h / CSR.cu / utils.cpp)."""

import numpy as np
import pytest

from mh_spgemm_tpu import CSR
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.errors import MatrixFormatError


def test_from_coo_sorts_and_builds_ptr():
    A = CSR.from_coo(3, 4, [2, 0, 0, 1], [1, 3, 0, 2], [5.0, 1.0, 2.0, 3.0])
    assert A.M == 3 and A.N == 4 and A.nnz == 4
    assert A.ptr.tolist() == [0, 2, 3, 4]
    assert A.col.tolist() == [0, 3, 2, 1]
    assert A.val.tolist() == [2.0, 1.0, 3.0, 5.0]


def test_from_coo_duplicates_kept_then_summed():
    kept = CSR.from_coo(2, 2, [0, 0], [1, 1], [1.0, 2.0])
    assert kept.nnz == 2
    summed = CSR.from_coo(2, 2, [0, 0], [1, 1], [1.0, 2.0],
                          sum_duplicates=True)
    assert summed.nnz == 1 and summed.val.tolist() == [3.0]


def test_from_coo_validates_range():
    with pytest.raises(MatrixFormatError):
        CSR.from_coo(2, 2, [0, 2], [0, 0], [1.0, 1.0])


def test_transpose_matches_scipy(rng):
    A = gen.random_uniform(200, nnz_per_row=5, seed=7)
    T = A.transpose()
    T_ref = CSR.from_scipy(A.to_scipy().T.tocsr())
    assert T.equals(T_ref, tol=0.0)


def test_transpose_roundtrip():
    A = gen.tiny_fixture()
    assert A.transpose().transpose().equals(A, tol=0.0)


def test_intprod_matches_reference_formula():
    A = gen.tiny_fixture()
    bl = np.diff(A.ptr)
    expected = int(sum(bl[c] for c in A.col))
    assert A.intprod(A) == expected


def test_equals_tolerance_abs_or_rel():
    A = CSR.from_coo(1, 2, [0, 0], [0, 1], [1e6, 1.0])
    B = A.copy()
    B.val = A.val + np.array([5e-4, 0.0])  # rel 5e-10 on 1e6: passes rel
    assert A.equals(B, tol=1e-9)
    B.val = A.val + np.array([0.0, 1e-8])  # abs 1e-8 on 1.0: fails both
    assert not A.equals(B, tol=1e-9)


def test_equals_structure_mismatch():
    A = CSR.from_coo(2, 2, [0, 1], [0, 1], [1.0, 2.0])
    B = CSR.from_coo(2, 2, [0, 1], [1, 1], [1.0, 2.0])
    assert not A.equals(B)


def test_validate_ok():
    gen.tiny_fixture().validate()
