"""ctypes bindings to the native C++ host library (``native/``).

The reference's runtime around the kernels is C++ (Matrix Market parsing
with an OpenMP row sort, CSR transpose, scans — ``src/utils.cpp``,
``inc/mmio_read.h``).  The TPU rebuild keeps a native host runtime for the
same jobs: ``native/host_runtime.cpp`` builds to ``libmhspgemm_host.so``
(see ``native/build.sh``) and is loaded lazily here.  Every entry point has
a pure-numpy fallback so the framework works without the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "libmhspgemm_host.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get("MHSPGEMM_NATIVE_LIB", _lib_path())
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mh_parse_mtx_body.restype = ctypes.c_longlong
        lib.mh_parse_mtx_body.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong),   # out M, N, nnz
            ctypes.POINTER(ctypes.POINTER(ctypes.c_longlong)),  # rows
            ctypes.POINTER(ctypes.POINTER(ctypes.c_longlong)),  # cols
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),    # vals
        ]
        lib.mh_free.restype = None
        lib.mh_free.argtypes = [ctypes.c_void_p]
        lib.mh_intprod.restype = ctypes.c_longlong
        lib.mh_intprod.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int)]
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.mh_bucket_entries.restype = ctypes.c_longlong
        lib.mh_bucket_entries.argtypes = [
            ip, ip, ip, ip, ctypes.c_longlong, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ip, ip, ip, ip]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_mtx_body(path: str, is_pattern: bool, is_complex: bool
                   ) -> Optional[Tuple[int, int, np.ndarray, np.ndarray,
                                       np.ndarray]]:
    """Parse the body of a coordinate .mtx with the C++ tokenizer.
    Returns (M, N, rows, cols, vals) with 0-based indices, or None."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_longlong * 3)()
    prows = ctypes.POINTER(ctypes.c_longlong)()
    pcols = ctypes.POINTER(ctypes.c_longlong)()
    pvals = ctypes.POINTER(ctypes.c_double)()
    rc = lib.mh_parse_mtx_body(path.encode(), int(is_pattern),
                               int(is_complex), dims,
                               ctypes.byref(prows), ctypes.byref(pcols),
                               ctypes.byref(pvals))
    if rc != 0:
        return None
    M, N, nnz = int(dims[0]), int(dims[1]), int(dims[2])
    rows = np.ctypeslib.as_array(prows, shape=(nnz,)).copy()
    cols = np.ctypeslib.as_array(pcols, shape=(nnz,)).copy()
    vals = np.ctypeslib.as_array(pvals, shape=(nnz,)).copy()
    lib.mh_free(prows)
    lib.mh_free(pcols)
    lib.mh_free(pvals)
    return M, N, rows, cols, vals


def bucket_entries(a_ptr: np.ndarray, a_col: np.ndarray,
                   b_ptr: np.ndarray, rows: np.ndarray, rb: int, w: int,
                   eb: int, nchunks: int) -> Optional[tuple]:
    """Native bucket-plan descriptor builder (one fused OpenMP pass over
    the class's A entries).  Returns (ent_dst, ent_src, ent_len,
    ent_aidx) shaped [nchunks, eb], or None when the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    ip = ctypes.POINTER(ctypes.c_int32)

    def as32(x):
        return np.ascontiguousarray(x, dtype=np.int32)

    a_ptr, a_col, b_ptr, rows = map(as32, (a_ptr, a_col, b_ptr, rows))
    shape = (nchunks, eb)
    ent_dst = np.full(shape, rb * w, dtype=np.int32)
    ent_src = np.zeros(shape, dtype=np.int32)
    ent_len = np.zeros(shape, dtype=np.int32)
    ent_aidx = np.zeros(shape, dtype=np.int32)
    rc = lib.mh_bucket_entries(
        a_ptr.ctypes.data_as(ip), a_col.ctypes.data_as(ip),
        b_ptr.ctypes.data_as(ip), rows.ctypes.data_as(ip),
        len(rows), rb, w, eb,
        ent_dst.ctypes.data_as(ip), ent_src.ctypes.data_as(ip),
        ent_len.ctypes.data_as(ip), ent_aidx.ctypes.data_as(ip))
    if rc != 0:
        return None
    return ent_dst, ent_src, ent_len, ent_aidx


def intprod(a_col: np.ndarray, b_ptr: np.ndarray) -> Optional[int]:
    """Native Sigma nnz(B[A.col[i]]) (reference src/main.cu:102-107)."""
    lib = _load()
    if lib is None:
        return None
    a_col = np.ascontiguousarray(a_col, dtype=np.int32)
    b_ptr = np.ascontiguousarray(b_ptr, dtype=np.int32)
    return int(lib.mh_intprod(
        a_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(a_col), None))
