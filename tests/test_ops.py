"""Unit tests for the vector primitives (ops/scan.py, ops/expand.py)."""

import jax.numpy as jnp
import numpy as np

from mh_spgemm_tpu.ops import scan as scan_ops
from mh_spgemm_tpu.ops import expand as expand_ops
from mh_spgemm_tpu.ops import binning as binning_ops


def test_exclusive_cumsum():
    x = jnp.array([3, 0, 2], jnp.int32)
    out = scan_ops.exclusive_cumsum(x)
    assert out.tolist() == [0, 3, 3, 5]


def test_rows_reduce_int():
    vals = jnp.array([1, 2, 3, 4, 5], jnp.int32)
    ptr = jnp.array([0, 2, 2, 5], jnp.int32)
    out = scan_ops.rows_reduce_int(vals, ptr)
    assert out.tolist() == [3, 0, 12]


def test_seg_scan_sum_matches_numpy(rng):
    n = 1000
    flags = np.zeros(n, dtype=bool)
    flags[0] = True
    flags[rng.integers(0, n, 100)] = True
    vals = rng.standard_normal(n)
    seg = np.cumsum(flags) - 1
    expected_tot = np.zeros(seg.max() + 1)
    np.add.at(expected_tot, seg, vals)
    out = scan_ops.seg_scan(jnp.add, jnp.asarray(flags), jnp.asarray(vals),
                            max_seg_len=n)
    # value at each segment end == segment total
    ends = np.flatnonzero(np.append(flags[1:], True))
    np.testing.assert_allclose(np.asarray(out)[ends], expected_tot,
                               rtol=1e-12)


def test_seg_scan_or():
    flags = jnp.array([True, False, False, True, False])
    vals = jnp.array([1, 2, 4, 8, 16], jnp.uint32)
    out = scan_ops.seg_scan(jnp.bitwise_or, flags, vals, max_seg_len=3)
    assert out.tolist() == [1, 3, 7, 8, 24]


def test_seg_scan_respects_max_seg_len_bound():
    # one segment of length 8; bound 8 must be enough (4 passes)
    flags = jnp.array([True] + [False] * 7)
    vals = jnp.ones(8, jnp.int32)
    out = scan_ops.seg_scan(jnp.add, flags, vals, max_seg_len=8)
    assert out.tolist() == [1, 2, 3, 4, 5, 6, 7, 8]


def test_compact():
    v = jnp.array([10, 20, 30, 40], jnp.int32)
    f = jnp.array([True, False, True, True])
    out = scan_ops.compact(v, f, 3)
    assert out.tolist() == [10, 30, 40]
    out2 = scan_ops.compact(v, f, 5, fill=-1)
    assert out2.tolist() == [10, 30, 40, -1, -1]


def test_expand_segments():
    lens = jnp.array([2, 0, 3], jnp.int32)
    ex = expand_ops.expand_segments(lens, 5)
    assert ex.seg_id.tolist() == [0, 0, 2, 2, 2]
    assert ex.offset.tolist() == [0, 1, 0, 1, 2]
    assert ex.starts.tolist() == [0, 2, 2, 5]


def test_expand_segments_padding():
    lens = jnp.array([2], jnp.int32)
    ex = expand_ops.expand_segments(lens, 4)
    assert ex.seg_id.tolist()[:2] == [0, 0]
    assert ex.starts[-1] == 2


def test_row_ids():
    ptr = jnp.array([0, 2, 2, 3], jnp.int32)
    out = expand_ops.row_ids(ptr, 3)
    assert out.tolist() == [0, 0, 2]


def test_expand_products_tiny():
    # A: row0 -> cols [1], row1 -> cols [0,1]; B rows: len 2, len 1
    a_ptr = jnp.array([0, 1, 3], jnp.int32)
    a_col = jnp.array([1, 0, 1], jnp.int32)
    b_ptr = jnp.array([0, 2, 3], jnp.int32)
    ps = expand_ops.expand_products(a_ptr, a_col, b_ptr, 4, 3)
    assert ps.crow.tolist() == [0, 1, 1, 1]
    assert ps.src.tolist() == [2, 0, 1, 2]
    assert ps.a_idx.tolist() == [0, 1, 1, 2]
    assert ps.valid.tolist() == [True] * 4


def test_bin_rows():
    work = jnp.array([0, 1, 5, 100, 3], jnp.int32)
    b = binning_ops.bin_rows(work, bounds=(0, 2, 8))
    assert b.bin_of_row.tolist() == [0, 1, 2, 3, 2]
    assert b.bin_size.tolist() == [1, 1, 2, 1]
    assert b.bin_offset.tolist() == [0, 1, 2, 4, 5]
    assert int(b.max_work) == 100
    # rows grouped by bin, stable
    assert b.rows_by_bin.tolist() == [0, 1, 2, 4, 3]


def test_group_size_heuristic():
    assert binning_ops.group_size(0, 0) == 1
    g = binning_ops.group_size(1024, 4)
    assert g >= 256 and (g & (g - 1)) == 0
    assert binning_ops.scan_passes(1) == 0
    assert binning_ops.scan_passes(8) == 3
    assert binning_ops.scan_passes(9) == 4
