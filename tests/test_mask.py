"""Mask-matrix formation (reference Form_mask_matrix_B)."""

import jax.numpy as jnp
import numpy as np

from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.ops import mask as mask_ops


def _reference_tiles(A):
    """Straightforward numpy construction of (tileptr, tilecol, tilemask)."""
    tileptr = [0]
    tilecol, tilemask = [], []
    for i in range(A.M):
        cols = A.col[A.ptr[i]:A.ptr[i + 1]]
        tiles = {}
        for c in cols:
            tiles.setdefault(c >> 5, 0)
            tiles[c >> 5] |= 1 << (c & 31)
        for t in sorted(tiles):
            tilecol.append(t)
            tilemask.append(tiles[t])
        tileptr.append(len(tilecol))
    return (np.array(tileptr), np.array(tilecol),
            np.array(tilemask, dtype=np.uint32))


def _check(A):
    d = A.device()
    tpr, total = mask_ops.count_tiles(d.ptr, d.col, d.M, d.nnz)
    T = int(total)
    mm = mask_ops.form_mask_matrix(d.ptr, d.col, d.M, d.nnz, T)
    rptr, rcol, rmask = _reference_tiles(A)
    assert T == rptr[-1]
    np.testing.assert_array_equal(np.asarray(mm.tileptr), rptr)
    np.testing.assert_array_equal(np.asarray(mm.tilecol), rcol)
    np.testing.assert_array_equal(np.asarray(mm.tilemask), rmask)
    np.testing.assert_array_equal(np.asarray(tpr), np.diff(rptr))
    # nnz_to_tile maps every nonzero into its tile's global index
    n2t = np.asarray(mm.nnz_to_tile)
    for j in range(A.nnz):
        t = n2t[j]
        assert rcol[t] == A.col[j] >> 5


def test_tiny_fixture():
    _check(gen.tiny_fixture())


def test_banded():
    _check(gen.banded(300, band=40, nnz_per_row=9, seed=3))


def test_random():
    _check(gen.random_uniform(257, nnz_per_row=7, seed=5))


def test_powerlaw():
    _check(gen.powerlaw(400, avg_nnz=6, seed=11))


def test_flops_upper_bound():
    A = gen.tiny_fixture()
    d = A.device()
    tpr, _ = mask_ops.count_tiles(d.ptr, d.col, d.M, d.nnz)
    fub = mask_ops.flops_upper_bound(d.ptr, d.col, tpr, d.nnz)
    tpr_np = np.asarray(tpr)
    expected = np.zeros(A.M, dtype=np.int64)
    for i in range(A.M):
        for j in range(A.ptr[i], A.ptr[i + 1]):
            expected[i] += tpr_np[A.col[j]]
    np.testing.assert_array_equal(np.asarray(fub), expected)


def test_flops_exact_is_intprod_per_row():
    A = gen.tiny_fixture()
    d = A.device()
    fe = mask_ops.flops_exact(d.ptr, d.col, d.ptr, d.nnz)
    assert int(np.asarray(fe).sum()) == A.intprod(A)
