"""Distributed SpGEMM on a virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest

from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.parallel.mesh import make_row_mesh
from mh_spgemm_tpu.parallel.spgemm_dist import partition_rows, spgemm_dist


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_row_mesh(n)


def test_partition_rows_roundtrip():
    A = gen.tiny_fixture()
    part = partition_rows(A, 4)
    assert part.ptr.shape == (4, 10)
    # every shard's nnz and rows reassemble the original
    R = part.rows_per_shard
    for d in range(4):
        lo, hi = d * R, min((d + 1) * R, A.M)
        np.testing.assert_array_equal(
            part.ptr[d, :hi - lo + 1], A.ptr[lo:hi + 1] - A.ptr[lo])
        k = part.nnz[d]
        np.testing.assert_array_equal(part.col[d, :k],
                                      A.col[A.ptr[lo]:A.ptr[lo] + k])


@pytest.mark.parametrize("strategy", ["replicate", "allgather"])
def test_dist_matches_oracle_small(strategy):
    mesh = _mesh(4)
    A = gen.banded(120, band=9, nnz_per_row=5, seed=21)
    C = spgemm_dist(A, None, mesh, b_strategy=strategy)
    C_ref = oracle_spgemm(A, A)
    assert C.equals(C_ref, tol=1e-9)


@pytest.mark.parametrize("strategy", ["replicate", "allgather"])
def test_dist_matches_oracle_powerlaw_8(strategy):
    mesh = _mesh(8)
    A = gen.powerlaw(300, avg_nnz=5, seed=22)
    C = spgemm_dist(A, None, mesh, b_strategy=strategy)
    C_ref = oracle_spgemm(A, A)
    assert C.equals(C_ref, tol=1e-9)


def test_dist_rectangular():
    mesh = _mesh(4)
    from mh_spgemm_tpu import CSR
    rng = np.random.default_rng(23)
    A = CSR.from_coo(60, 90, rng.integers(0, 60, 250),
                     rng.integers(0, 90, 250), rng.standard_normal(250),
                     sum_duplicates=True)
    B = CSR.from_coo(90, 40, rng.integers(0, 90, 220),
                     rng.integers(0, 40, 220), rng.standard_normal(220),
                     sum_duplicates=True)
    C = spgemm_dist(A, B, mesh, b_strategy="allgather")
    assert C.equals(oracle_spgemm(A, B), tol=1e-9)


def test_dist_uneven_rows():
    """M not divisible by D: last shard is ragged."""
    mesh = _mesh(8)
    A = gen.random_uniform(101, nnz_per_row=4, seed=24)
    C = spgemm_dist(A, None, mesh, b_strategy="allgather")
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_single_device():
    mesh = _mesh(1)
    A = gen.tiny_fixture()
    C = spgemm_dist(A, None, mesh, b_strategy="replicate")
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


@pytest.mark.parametrize("n", [4, 8])
def test_dist_ragged_matches_oracle(n):
    mesh = _mesh(n)
    A = gen.banded(120, band=9, nnz_per_row=5, seed=21)
    C = spgemm_dist(A, None, mesh, b_strategy="ragged")
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_ragged_powerlaw_and_uneven():
    mesh = _mesh(8)
    for A in (gen.powerlaw(300, avg_nnz=5, seed=22),
              gen.random_uniform(101, nnz_per_row=4, seed=24)):
        C = spgemm_dist(A, None, mesh, b_strategy="ragged")
        assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_ragged_plan_traffic_below_allgather():
    """Banded locality: the ragged fetch plan moves far less than nnz(B)."""
    from mh_spgemm_tpu.parallel.spgemm_dist import (partition_rows,
                                                    plan_ragged_fetch)
    A = gen.banded(512, band=6, nnz_per_row=5, seed=3)
    ap = partition_rows(A, 8)
    bp = partition_rows(A, 8)
    fp = plan_ragged_fetch(A, A, ap, bp)
    # per-shard received volume cap (D * v_cap) well under full nnz(B)
    assert 8 * fp.v_cap < A.nnz


def test_dist_state_reuse():
    mesh = _mesh(4)
    A = gen.banded(100, band=7, nnz_per_row=4, seed=30)
    st = {}
    ref = oracle_spgemm(A, A)
    for _ in range(3):
        C = spgemm_dist(A, None, mesh, b_strategy="ragged", state=st)
        assert C.equals(ref, tol=1e-9)
    assert st.get("fn") is not None


@pytest.mark.parametrize("strategy", ["replicate", "allgather", "ragged"])
def test_dist_empty_trailing_shards(strategy):
    """M=9 with D=8 -> ceil(9/8)=2 rows/shard, shards 5..7 own ZERO rows.

    Regression: partition_rows/plan_ragged_fetch used to index
    A.ptr[d*R] / B.ptr[s*RB] past the end for those shards (ADVICE.md)."""
    mesh = _mesh(8)
    A = gen.random_uniform(9, nnz_per_row=3, seed=77)
    C = spgemm_dist(A, None, mesh, b_strategy=strategy)
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


@pytest.mark.parametrize("strategy", ["replicate", "allgather", "ragged"])
def test_dist_esc_engine_still_works(strategy):
    """The flat ESC shard kernel remains as differential fallback."""
    mesh = _mesh(4)
    A = gen.banded(120, band=9, nnz_per_row=5, seed=21)
    C = spgemm_dist(A, None, mesh, b_strategy=strategy, engine="esc")
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_bucketed_vs_esc_differential():
    mesh = _mesh(8)
    A = gen.powerlaw(300, avg_nnz=5, seed=31)
    Cb = spgemm_dist(A, None, mesh, b_strategy="ragged",
                     engine="bucketed")
    Ce = spgemm_dist(A, None, mesh, b_strategy="ragged", engine="esc")
    assert Cb.equals(Ce, tol=1e-9)


def test_dist_chunked_fallback():
    """A shard plan overflow must fall back to row-chunked execution."""
    from mh_spgemm_tpu.parallel import spgemm_dist as sd
    mesh = _mesh(4)
    A = gen.powerlaw(300, avg_nnz=5, seed=33)
    ref = oracle_spgemm(A, A)
    calls = {"n": 0}
    real = sd._spgemm_dist_bucketed

    def flaky(Asub, B, mesh_, config, b_strategy, state):
        calls["n"] += 1
        if calls["n"] == 1 and Asub.M == A.M:
            raise ValueError("padded slab exceeds int32 (simulated)")
        return real(Asub, B, mesh_, config, b_strategy, state)

    sd._spgemm_dist_bucketed, orig = flaky, real
    try:
        C = sd.spgemm_dist(A, None, mesh, b_strategy="allgather")
    finally:
        sd._spgemm_dist_bucketed = orig
    assert calls["n"] >= 2 and C.equals(ref, tol=1e-9)


def test_dist_multiprocess():
    """TWO jax processes over a loopback coordinator: exercises
    init_multihost and the cross-process (DCN-path) mesh that the
    single-process virtual mesh cannot (VERDICT round-1 item 8)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, "scripts/dist_worker.py", str(port), str(i),
         "2", "2"], stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=".") for i in range(2)]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: multiprocess dist OK" in out


def test_work_balanced_bounds_cut_skew():
    """Equal-intprod bounds (VERDICT round-2 item 7): on a skewed
    power-law matrix the heaviest shard's work under balanced bounds is
    far closer to the mean than under the equal-row split."""
    from mh_spgemm_tpu.parallel.spgemm_dist import balance_bounds
    A = gen.powerlaw(400, avg_nnz=6, seed=55)
    D = 8
    blens = np.diff(A.ptr).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(blens[A.col])])
    p_cum = cs[A.ptr]

    def skew(bounds):
        w = np.diff(p_cum[bounds])
        return w.max() / max(1, w.mean())

    R = -(-A.M // D)
    uniform = np.minimum(np.arange(D + 1) * R, A.M)
    balanced = balance_bounds(A, A, D)
    assert skew(balanced) <= skew(uniform)
    assert skew(balanced) < 1.6
    # and the engine is still correct under the balanced partition
    mesh = _mesh(D)
    C = spgemm_dist(A, None, mesh, b_strategy="ragged")
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


@pytest.mark.parametrize("strategy", ["replicate", "allgather", "ragged"])
def test_dist_mosaic_fill_matches_oracle(strategy):
    """Mosaic ragged-fill expansion under shard_map (VERDICT round-2
    item 4): the pairs transport stream is built per shard — on host for
    replicated B, ON DEVICE after the collective for gathered / halo
    layouts — and every width class is forced onto the fill frontend
    (dma_fill='interpret' exercises the kernel on the CPU mesh)."""
    mesh = _mesh(4)
    cfg = SpGEMMConfig(dma_fill="interpret")
    for A in (gen.banded(120, band=9, nnz_per_row=5, seed=21),
              gen.powerlaw(300, avg_nnz=5, seed=22)):
        C = spgemm_dist(A, None, mesh, config=cfg, b_strategy=strategy)
        assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_mosaic_fill_state_reuse_and_uneven():
    mesh = _mesh(8)
    cfg = SpGEMMConfig(dma_fill="interpret")
    A = gen.random_uniform(101, nnz_per_row=4, seed=24)
    st = {}
    ref = oracle_spgemm(A, A)
    for _ in range(2):
        C = spgemm_dist(A, None, mesh, config=cfg, b_strategy="ragged",
                        state=st)
        assert C.equals(ref, tol=1e-9)


@pytest.mark.parametrize("n", [4, 8])
def test_dist_ragged_overlap_matches_oracle(n, monkeypatch):
    """Overlapped ragged path: local-only rows compute while the halo
    exchange is in flight; halo rows follow (SURVEY.md §5.8).  Forced:
    on a CPU mesh the plan-time model correctly prefers plain ragged
    (no second execution resource), and the kernel must stay tested."""
    monkeypatch.setenv("MHSPGEMM_FORCE_OVERLAP", "1")
    mesh = _mesh(n)
    for A in (gen.banded(120, band=9, nnz_per_row=5, seed=21),
              gen.powerlaw(300, avg_nnz=5, seed=22),
              gen.random_uniform(101, nnz_per_row=4, seed=24)):
        C = spgemm_dist(A, None, mesh, b_strategy="ragged_overlap")
        assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_ragged_overlap_mosaic_fill(monkeypatch):
    """Overlap path with the fill frontend on BOTH stages: stage 1's
    pairs stream is host-built per shard (resident before the exchange),
    stage 2's is re-encoded on device from the [local | halo] payload."""
    monkeypatch.setenv("MHSPGEMM_FORCE_OVERLAP", "1")
    mesh = _mesh(4)
    cfg = SpGEMMConfig(dma_fill="interpret")
    for A in (gen.banded(120, band=9, nnz_per_row=5, seed=21),
              gen.powerlaw(300, avg_nnz=5, seed=22)):
        C = spgemm_dist(A, None, mesh, config=cfg,
                        b_strategy="ragged_overlap")
        assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_ragged_overlap_state_reuse(monkeypatch):
    monkeypatch.setenv("MHSPGEMM_FORCE_OVERLAP", "1")
    mesh = _mesh(4)
    A = gen.banded(100, band=7, nnz_per_row=4, seed=30)
    st = {}
    ref = oracle_spgemm(A, A)
    for _ in range(2):
        C = spgemm_dist(A, None, mesh, b_strategy="ragged_overlap",
                        state=st)
        assert C.equals(ref, tol=1e-9)


def test_dist_overlap_falls_back_on_cpu_mesh():
    """The plan-time timeline model (max(comm, s1) + s2 + class fixed
    costs vs comm + single-stage) must reject the overlap split on a
    host CPU mesh — no second execution resource means comm hiding buys
    nothing and the split's extra classes/area always lose
    (DIST_SCALING_r3: overlap lost at every D; VERDICT round-4 #4).
    Correctness is unchanged either way; this pins the DECISION."""
    mesh = _mesh(4)
    A = gen.powerlaw(300, avg_nnz=5, seed=22)
    st = {}
    C = spgemm_dist(A, None, mesh, b_strategy="ragged_overlap", state=st)
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)
    # the recorded state comes from the fallback's ragged path: its
    # kernel signature has no halo-stage class arrays
    assert st, "state not recorded"


# ---------------------------------------------------------------------------
# 2-D block-partitioned grid (BASELINE.json north star: "A row-partitioned
# and B block-partitioned")
# ---------------------------------------------------------------------------

def _grid(dr, dc):
    if len(jax.devices()) < dr * dc:
        pytest.skip(f"needs {dr * dc} devices")
    from mh_spgemm_tpu.parallel.mesh import make_grid_mesh
    return make_grid_mesh(dr, dc)


@pytest.mark.parametrize("dr,dc", [(2, 2), (4, 2), (2, 4)])
def test_dist_grid2d_matches_oracle(dr, dc):
    """Shard (r, c) computes C[rows_r, cols_c]; per-row segments from
    increasing column blocks concatenate into ascending CSR order."""
    mesh = _grid(dr, dc)
    for A in (gen.banded(120, band=9, nnz_per_row=5, seed=31),
              gen.powerlaw(300, avg_nnz=5, seed=32),
              gen.random_uniform(101, nnz_per_row=4, seed=33)):
        C = spgemm_dist(A, None, mesh, b_strategy="grid2d")
        assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_dist_grid2d_f32_and_state_reuse():
    mesh = _grid(2, 2)
    A = gen.banded(100, band=7, nnz_per_row=4, seed=34)
    cfg = SpGEMMConfig(value_dtype="float32", tolerance=1e-4)
    ref = oracle_spgemm(A, A)
    st = {}
    for _ in range(2):
        C = spgemm_dist(A, None, mesh, config=cfg, b_strategy="grid2d",
                        state=st)
        assert C.equals(ref, tol=1e-4)
    assert st.get("grid") == (2, 2)


def test_dist_grid2d_mosaic_fill():
    """grid2d with the Mosaic fill frontend (interpret mode on CPU)."""
    mesh = _grid(2, 2)
    cfg = SpGEMMConfig(dma_fill="interpret")
    A = gen.banded(120, band=9, nnz_per_row=5, seed=35)
    C = spgemm_dist(A, None, mesh, config=cfg, b_strategy="grid2d")
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)


def test_plan_col_blocks_partitions_exactly():
    from mh_spgemm_tpu.parallel.spgemm_dist import plan_col_blocks
    A = gen.powerlaw(200, avg_nnz=6, seed=36)
    cb, ptrs, cols, vals = plan_col_blocks(A, 3)
    assert cb[0] == 0 and cb[-1] == A.N
    assert sum(c.size for c in cols) == A.nnz
    for c in range(3):
        assert (cols[c] >= cb[c]).all() and (cols[c] < cb[c + 1]).all()
        # per-row order preserved (ascending inside each row)
        for r in range(200):
            seg = cols[c][ptrs[c][r]:ptrs[c][r + 1]]
            assert (np.diff(seg) > 0).all() if seg.size > 1 else True
