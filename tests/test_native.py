"""Native C++ host runtime (native/host_runtime.cpp via ctypes)."""

import ctypes
import os

import numpy as np
import pytest

from mh_spgemm_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native library not built (run native/build.sh)")


def test_parse_mtx_body_matches_python(tmp_path):
    from mh_spgemm_tpu.io.mmio import read_mtx, write_mtx
    from mh_spgemm_tpu.bench import gen
    A = gen.banded(500, band=10, nnz_per_row=7, seed=77)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, A)
    # native path is exercised inside read_mtx when available
    out = native.parse_mtx_body(p, False, False)
    assert out is not None
    M, N, rows, cols, vals = out
    assert M == A.M and N == A.N
    B = read_mtx(p)
    assert B.equals(A, tol=0.0) or B.equals(A)


def test_parse_pattern(tmp_path):
    p = tmp_path / "p.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                 "2 2 2\n1 2\n2 1\n")
    out = native.parse_mtx_body(str(p), True, False)
    M, N, rows, cols, vals = out
    assert rows.tolist() == [0, 1] and cols.tolist() == [1, 0]
    assert vals.tolist() == [1.0, 1.0]


def test_parse_complex_drops_imag(tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text("%%MatrixMarket matrix coordinate complex general\n"
                 "2 2 1\n1 1 2.5 -3.5\n")
    out = native.parse_mtx_body(str(p), False, True)
    _, _, rows, cols, vals = out
    assert vals.tolist() == [2.5]


def test_intprod_native_matches_python():
    from mh_spgemm_tpu.bench import gen
    A = gen.random_uniform(300, nnz_per_row=6, seed=88)
    expected = A.intprod(A)
    got = native.intprod(A.col, A.ptr)
    assert got == expected


def test_exclusive_scan_and_transpose():
    lib = ctypes.CDLL(os.environ.get("MHSPGEMM_NATIVE_LIB",
                                     native._lib_path()))
    data = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    lib.mh_exclusive_scan(data.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int)), ctypes.c_longlong(5))
    assert data.tolist() == [0, 3, 4, 8, 9]

    from mh_spgemm_tpu.bench import gen
    A = gen.random_uniform(100, nnz_per_row=4, seed=99)
    t_ptr = np.zeros(A.N + 1, dtype=np.int32)
    t_col = np.zeros(A.nnz, dtype=np.int32)
    t_val = np.zeros(A.nnz, dtype=np.float64)
    lib.mh_csr_transpose(
        ctypes.c_longlong(A.M), ctypes.c_longlong(A.N),
        A.ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        A.col.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        A.val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        t_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        t_val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    T = A.transpose()
    np.testing.assert_array_equal(t_ptr, T.ptr)
    np.testing.assert_array_equal(t_col, T.col)
    np.testing.assert_allclose(t_val, T.val)


def test_bucket_entries_matches_numpy(monkeypatch):
    """The native descriptor builder must produce exactly the numpy plan."""
    from mh_spgemm_tpu.bench import gen
    from mh_spgemm_tpu.ops import bucketed

    A = gen.powerlaw(400, avg_nnz=6, seed=31)
    plan_native = bucketed.plan_buckets(A.ptr, A.col, A.ptr, min_width=8)
    monkeypatch.setattr(native, "bucket_entries", lambda *a, **k: None)
    plan_np = bucketed.plan_buckets(A.ptr, A.col, A.ptr, min_width=8)
    assert len(plan_native.classes) == len(plan_np.classes)
    for cn, cp in zip(plan_native.classes, plan_np.classes):
        assert cn.W == cp.W and cn.rb == cp.rb and cn.eb == cp.eb
        np.testing.assert_array_equal(cn.rows_g, cp.rows_g)
        np.testing.assert_array_equal(cn.ent_dst, cp.ent_dst)
        np.testing.assert_array_equal(cn.ent_src, cp.ent_src)
        np.testing.assert_array_equal(cn.ent_len, cp.ent_len)
        np.testing.assert_array_equal(cn.ent_aidx, cp.ent_aidx)
