"""Matrix Market reader semantics (reference inc/mmio_read.h:34-159)."""

import numpy as np
import pytest

from mh_spgemm_tpu import CSR, read_mtx, write_mtx, extract_matrix_name
from mh_spgemm_tpu.errors import MatrixFormatError


def _write(tmp_path, text, name="t.mtx"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_general_real(tmp_path):
    p = _write(tmp_path, """%%MatrixMarket matrix coordinate real general
% comment
3 3 4
1 1 2.0
2 3 -1.5
3 1 4.0
1 3 1e-2
""")
    A = read_mtx(p)
    assert A.M == A.N == 3 and A.nnz == 4
    assert A.ptr.tolist() == [0, 2, 3, 4]
    assert A.col.tolist() == [0, 2, 2, 0]
    np.testing.assert_allclose(A.val, [2.0, 1e-2, -1.5, 4.0])


def test_symmetric_expansion(tmp_path):
    p = _write(tmp_path, """%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 1.0
2 1 2.0
3 3 3.0
""")
    A = read_mtx(p)
    # off-diagonal (2,1) also yields (1,2); diagonals not duplicated
    assert A.nnz == 4
    S = A.to_scipy().toarray()
    np.testing.assert_allclose(S, S.T)
    assert A.is_symmetric


def test_pattern_gets_ones(tmp_path):
    p = _write(tmp_path, """%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
""")
    A = read_mtx(p)
    np.testing.assert_allclose(A.val, [1.0, 1.0])


def test_integer_cast(tmp_path):
    p = _write(tmp_path, """%%MatrixMarket matrix coordinate integer general
2 2 1
1 1 7
""")
    A = read_mtx(p)
    assert A.val.tolist() == [7.0]


def test_complex_keeps_real_part(tmp_path):
    p = _write(tmp_path, """%%MatrixMarket matrix coordinate complex general
2 2 1
2 2 1.5 -9.0
""")
    A = read_mtx(p)
    assert A.val.tolist() == [1.5]


def test_hermitian_expands(tmp_path):
    p = _write(tmp_path, """%%MatrixMarket matrix coordinate complex hermitian
2 2 2
1 1 1.0 0.0
2 1 2.0 3.0
""")
    A = read_mtx(p)
    assert A.nnz == 3  # (1,1), (2,1), (1,2)


def test_bad_banner_raises(tmp_path):
    p = _write(tmp_path, "%%NotMatrixMarket x\n1 1 0\n")
    with pytest.raises(MatrixFormatError):
        read_mtx(p)


def test_roundtrip_write_read(tmp_path):
    from mh_spgemm_tpu.bench import gen
    A = gen.tiny_fixture()
    p = str(tmp_path / "rt.mtx")
    write_mtx(p, A)
    B = read_mtx(p)
    assert A.equals(B, tol=0.0)


def test_reference_bundled_matrix():
    """Parse the one .mtx the reference ships (nsparse test matrix)."""
    A = read_mtx("/root/reference/other_code/nsparse/data/test.mtx")
    assert A.M == 18 and A.N == 16 and A.nnz == 23


def test_extract_matrix_name():
    assert extract_matrix_name("/a/b/cage12.mtx") == "cage12"
    assert extract_matrix_name("x.mtx.gz") == "x"


import os

_FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.parametrize("name,scipy_kind", [
    ("mm_spec_example.mtx", "general"),
    ("sym_pattern8.mtx", "symmetric-pattern"),
    ("herm4.mtx", "hermitian"),
    ("skew4.mtx", "skew"),
])
def test_committed_fixture_matches_scipy(name, scipy_kind):
    """Committed in-repo .mtx fixtures (not runtime-generated): parse
    must agree EXACTLY with scipy.io.mmread's structure, and SpGEMM on
    them must match the oracle (VERDICT round-1 item 9 — protocol
    parity on files that live in git, not synthetic streams)."""
    import scipy.io
    import scipy.sparse
    from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm, spgemm_host
    from mh_spgemm_tpu.io.mmio import read_mtx

    path = os.path.join(_FIXTURES, name)
    A = read_mtx(path)
    S = scipy.sparse.csr_matrix(np.real(scipy.io.mmread(path)))
    S.sort_indices()
    S.sum_duplicates()
    np.testing.assert_array_equal(A.ptr, S.indptr)
    np.testing.assert_array_equal(A.col, S.indices)
    np.testing.assert_allclose(A.val, S.data, rtol=0, atol=0)
    # full protocol: C = A @ A vs oracle, every engine
    ref = oracle_spgemm(A, A)
    for mode in ("bucketed", "masked", "esc"):
        C = spgemm_host(A, None, config=SpGEMMConfig(mode=mode))
        assert C.equals(ref, tol=1e-9), mode
