"""CSR matrix container.

TPU-native counterpart of the reference's ``CSR`` class (``inc/CSR.h:4-44``,
``src/CSR.cu:1-135``): host arrays are numpy, device arrays are jax arrays
(the ``H2D``/``D2H`` pair becomes ``device()``/``host()``).  The tile arrays
(``tileptr``/``tilecol``/``tilemask``) of the reference's mask matrix live in
:class:`mh_spgemm_tpu.ops.mask.MaskMatrix` instead of being bolted onto the
CSR class — on TPU they are a derived, pipeline-internal representation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .errors import MatrixFormatError, ShapeMismatchError, require


@dataclasses.dataclass
class CSR:
    """Host-resident CSR matrix: ``ptr`` int32[M+1], ``col`` int32[nnz],
    ``val`` value_dtype[nnz].  Columns within each row are sorted ascending
    (the reference sorts on load, ``inc/mmio_read.h:9-31``)."""

    M: int
    N: int
    ptr: np.ndarray
    col: np.ndarray
    val: np.ndarray
    is_symmetric: bool = False

    @property
    def nnz(self) -> int:
        return int(self.ptr[-1])

    # -- construction ------------------------------------------------------

    @classmethod
    def from_coo(cls, M: int, N: int, rows, cols, vals,
                 is_symmetric: bool = False, sum_duplicates: bool = False,
                 dtype=np.float64) -> "CSR":
        """Build CSR from coordinate triples; sorts columns within rows.

        Like the reference reader, duplicate coordinates are kept as-is by
        default (``inc/mmio_read.h`` never merges duplicates); pass
        ``sum_duplicates=True`` for canonicalisation.
        """
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=dtype)
        require(rows.shape == cols.shape == vals.shape, MatrixFormatError,
                "COO arrays must have equal length")
        if rows.size:
            require(int(rows.min()) >= 0 and int(rows.max()) < M,
                    MatrixFormatError, "row index out of range")
            require(int(cols.min()) >= 0 and int(cols.max()) < N,
                    MatrixFormatError, "col index out of range")
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if sum_duplicates and rows.size:
            keep = np.empty(rows.size, dtype=bool)
            keep[0] = True
            keep[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            seg = np.cumsum(keep) - 1
            new_vals = np.zeros(int(seg[-1]) + 1, dtype=dtype)
            np.add.at(new_vals, seg, vals)
            rows, cols, vals = rows[keep], cols[keep], new_vals
        ptr = np.zeros(M + 1, dtype=np.int32)
        np.add.at(ptr, rows + 1, 1)
        np.cumsum(ptr, out=ptr)
        return cls(M=M, N=N, ptr=ptr.astype(np.int32),
                   col=cols.astype(np.int32), val=vals,
                   is_symmetric=is_symmetric)

    @classmethod
    def from_scipy(cls, mat, is_symmetric: bool = False) -> "CSR":
        m = mat.tocsr()
        m.sort_indices()
        return cls(M=m.shape[0], N=m.shape[1],
                   ptr=m.indptr.astype(np.int32),
                   col=m.indices.astype(np.int32),
                   val=np.asarray(m.data),
                   is_symmetric=is_symmetric)

    def to_scipy(self):
        import scipy.sparse as sp
        return sp.csr_matrix((self.val, self.col, self.ptr),
                             shape=(self.M, self.N))

    # -- transforms --------------------------------------------------------

    def transpose(self) -> "CSR":
        """CSR -> CSC relabel, i.e. B = A^T (reference
        ``matrix_transposition``, ``src/utils.cpp:20-46``)."""
        nnz = self.nnz
        tptr = np.zeros(self.N + 1, dtype=np.int32)
        np.add.at(tptr, self.col + 1, 1)
        np.cumsum(tptr, out=tptr)
        tcol = np.empty(nnz, dtype=np.int32)
        tval = np.empty(nnz, dtype=self.val.dtype)
        rows = np.repeat(np.arange(self.M, dtype=np.int32),
                         np.diff(self.ptr))
        # stable counting-sort by column; rows stay ascending per column
        dest = tptr[self.col] + _rank_within_group(self.col)
        tcol[dest] = rows
        tval[dest] = self.val
        return CSR(M=self.N, N=self.M, ptr=tptr, col=tcol, val=tval,
                   is_symmetric=self.is_symmetric)

    def copy(self) -> "CSR":
        return CSR(M=self.M, N=self.N, ptr=self.ptr.copy(),
                   col=self.col.copy(), val=self.val.copy(),
                   is_symmetric=self.is_symmetric)

    def device(self, value_dtype=None, pad: bool = False):
        """H2D: return a DeviceCSR with jax arrays (reference CSR::H2D,
        src/CSR.cu:97-110).

        ``pad=True`` quantizes the array extents to the static-shape grid
        (ops/shapes.py) so matrices of similar size share every compiled
        kernel — the TPU analogue of the reference's fixed bin/hash-table
        capacities.  Padded rows are empty (ptr repeats its last value) and
        padded nonzeros reference column 0 but are excluded from every
        per-row reduction because they lie beyond ``ptr[M]``.
        """
        import jax.numpy as jnp

        from .ops.shapes import pad1, quantize

        vd = value_dtype or self.val.dtype
        ptr, col, val = self.ptr, self.col, self.val
        if pad:
            m_pad = quantize(self.M)
            nnz_pad = quantize(max(1, self.nnz))
            ptr = pad1(ptr, m_pad + 1, fill=ptr[-1])
            col = pad1(col, nnz_pad, fill=0)
            val = pad1(val, nnz_pad, fill=0)
        return DeviceCSR(
            M=self.M, N=self.N,
            ptr=jnp.asarray(ptr, dtype=jnp.int32),
            col=jnp.asarray(col, dtype=jnp.int32),
            val=jnp.asarray(val, dtype=vd),
            nnz_true=self.nnz,
        )

    # -- analysis ----------------------------------------------------------

    def row_nnz(self) -> np.ndarray:
        return np.diff(self.ptr)

    def intprod(self, B: "CSR") -> int:
        """Intermediate-product count Sigma_i nnz(B[A.col[i]]) — the flop/2
        figure of the benchmark protocol (reference src/main.cu:102-107)."""
        require(self.N == B.M, ShapeMismatchError, "A.N must equal B.M")
        bl = np.diff(B.ptr).astype(np.int64)
        return int(bl[self.col].sum())

    def validate(self) -> None:
        require(self.ptr.shape == (self.M + 1,), MatrixFormatError,
                "ptr length must be M+1")
        require(int(self.ptr[0]) == 0, MatrixFormatError, "ptr[0] must be 0")
        require(bool(np.all(np.diff(self.ptr) >= 0)), MatrixFormatError,
                "ptr must be nondecreasing")
        if self.nnz:
            require(int(self.col.min()) >= 0 and int(self.col.max()) < self.N,
                    MatrixFormatError, "column index out of range")

    # -- comparison (reference CSR::operator==, src/CSR.cu:48-96) ----------

    def equals(self, other: "CSR", tol: float = 1e-9,
               max_report: int = 10, verbose: bool = False) -> bool:
        """Exact nnz / ptr / col match; values within ``tol`` absolute OR
        relative, mirroring src/CSR.cu:60,79-81."""
        if self.M != other.M or self.N != other.N:
            return False
        if self.nnz != other.nnz:
            if verbose:
                print(f"nnz mismatch: {self.nnz} vs {other.nnz}")
            return False
        if not np.array_equal(self.ptr, other.ptr):
            return False
        if not np.array_equal(self.col, other.col):
            return False
        a = np.asarray(self.val, dtype=np.float64)
        b = np.asarray(other.val, dtype=np.float64)
        diff = np.abs(a - b)
        ok = (a == b) | (diff < tol) | (diff < tol * np.abs(a))
        if not bool(ok.all()):
            if verbose:
                bad = np.flatnonzero(~ok)[:max_report]
                for j in bad:
                    print(f"value mismatch at {j}: {a[j]} vs {b[j]}")
            return False
        return True

    def __eq__(self, other):  # noqa: D105
        if not isinstance(other, CSR):
            return NotImplemented
        return self.equals(other)

    def __hash__(self):
        return id(self)


def _rank_within_group(keys: np.ndarray) -> np.ndarray:
    """For each element, its 0-based rank among equal keys appearing earlier
    (keys unsorted).  Used by transpose to keep row order stable."""
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    is_new = np.ones(keys.size, dtype=np.int64)
    if keys.size:
        is_new[1:] = (sorted_keys[1:] != sorted_keys[:-1]).astype(np.int64)
    grp_start = np.maximum.accumulate(np.where(is_new, np.arange(keys.size), 0))
    rank_sorted = np.arange(keys.size) - grp_start
    rank = np.empty(keys.size, dtype=np.int64)
    rank[order] = rank_sorted
    return rank


@dataclasses.dataclass
class DeviceCSR:
    """Device-resident CSR (jax arrays).  ``host()`` is the D2H path.

    Arrays may be capacity-padded (see :meth:`CSR.device`): ``M`` / ``N`` /
    ``nnz_true`` are the true logical extents, array shapes are the padded
    static extents.  ``host()`` trims back to the logical sizes.
    """

    M: int
    N: int
    ptr: object  # jnp int32[M_pad+1]
    col: object  # jnp int32[nnz_pad]
    val: object  # jnp value[nnz_pad]
    nnz_true: Optional[int] = None

    @property
    def nnz(self) -> int:
        """True logical nnz (falls back to the array extent if unpadded)."""
        if self.nnz_true is not None:
            return self.nnz_true
        return int(self.col.shape[0])

    @property
    def m_pad(self) -> int:
        """Padded (static) row count = array extent of ptr minus one."""
        return int(self.ptr.shape[0]) - 1

    @property
    def nnz_pad(self) -> int:
        """Padded (static) nnz = array extent of col/val."""
        return int(self.col.shape[0])

    def host(self) -> CSR:
        nnz = self.nnz
        return CSR(M=self.M, N=self.N,
                   ptr=np.asarray(self.ptr)[: self.M + 1],
                   col=np.asarray(self.col)[:nnz],
                   val=np.asarray(self.val)[:nnz])

    def block_until_ready(self) -> "DeviceCSR":
        self.val.block_until_ready()
        return self
