"""Mosaic ragged-fill expansion (ops/ragged_fill.py) — interpreter-mode
tests on CPU; the real-chip path is exercised by the benchmark driver."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm  # noqa: E402
from mh_spgemm_tpu.bench import gen  # noqa: E402
from mh_spgemm_tpu.ops import bucketed as B  # noqa: E402
from mh_spgemm_tpu.ops.ragged_fill import PAD_ROWS, ragged_fill  # noqa: E402
from mh_spgemm_tpu.pipeline import spgemm_bucketed  # noqa: E402


def test_kernel_copies_runs_exactly():
    """Random non-overlapping runs with misaligned src and dst."""
    rng = np.random.default_rng(0)
    wrows, epg = 16, 8
    NSRC = wrows * 128 * 4
    pairs = np.zeros((NSRC // 128 + wrows + PAD_ROWS, 128), np.int32)
    pairs.reshape(-1)[:NSRC] = rng.integers(1, 1 << 30, NSRC)
    S, out_elems = 3, 4096
    win_row = np.zeros((S, 2), np.int32)
    runs = np.zeros((S, epg, 3), np.int32)
    expect = np.full(out_elems, -1, np.int64)
    cur = 0
    for g in range(S):
        wr = g * 8
        cnt = 0
        for e in range(epg):
            ln = int(rng.integers(1, 300))
            if cur + ln + 7 > out_elems:
                break
            src = int(rng.integers(128, wrows * 128 - ln))
            dst = cur + int(rng.integers(0, 7))
            cur = dst + ln
            runs[g, e] = (src, dst, ln)
            expect[dst:dst + ln] = pairs.reshape(-1)[
                wr * 128 + src: wr * 128 + src + ln]
            cnt += 1
        win_row[g] = (wr, cnt)
    out = np.asarray(ragged_fill(
        jnp.asarray(win_row), jnp.asarray(runs), jnp.asarray(pairs),
        out_rows=out_elems // 128, wrows=wrows, interpret=True))
    got = out.reshape(-1)[:out_elems]
    cov = expect >= 0
    np.testing.assert_array_equal(got[cov], expect[cov])


def test_run_planner_covers_every_slot():
    """Every live slab word is covered by exactly one planned run."""
    A = gen.powerlaw(200, avg_nnz=6, seed=3)
    plan = B.plan_buckets(A.ptr, A.col, A.ptr, min_width=8, vwords=2,
                          dma_fill="interpret")
    assert any(c.fill for c in plan.classes)
    for c in plan.classes:
        if not c.fill:
            continue
        for k in range(c.nchunks):
            covered = np.zeros(c.rb * c.W * c.stride, np.int8)
            for s in range(c.runs.shape[1]):
                for e in range(int(c.win_row[k, s, 1])):
                    _, dst, ln = c.runs[k, s, e]
                    covered[dst:dst + ln] += 1
            live = c.ent_len[k] > 0
            want = np.zeros_like(covered)
            for dst, ln in zip(c.ent_dst[k][live], c.ent_len[k][live]):
                want[dst * c.stride:(dst + ln) * c.stride] = 1
            np.testing.assert_array_equal(covered, want)


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_fill_engine_matches_oracle(dtype):
    A = gen.kron(8, edge_factor=6, seed=9)
    cfg = SpGEMMConfig(mode="bucketed", dma_fill="interpret",
                       value_dtype=dtype)
    C, st = spgemm_bucketed(A, A, config=cfg)
    assert any(c.fill for c in st.plan.classes)
    tol = 1e-5 if dtype == "float32" else 1e-9
    assert C.host().equals(oracle_spgemm(A, A), tol=tol)


def test_fill_state_reuse_two_iters():
    A = gen.banded(150, band=10, nnz_per_row=7, seed=11)
    cfg = SpGEMMConfig(mode="bucketed", dma_fill="interpret")
    ref = oracle_spgemm(A, A)
    st = None
    for _ in range(2):
        C, st = spgemm_bucketed(A, A, config=cfg, state=st)
        assert C.host().equals(ref, tol=1e-9)


def test_auto_fill_off_device_is_noop():
    """dma_fill='auto' must not enable fill on a CPU backend."""
    A = gen.banded(100, band=8, nnz_per_row=6, seed=2)
    plan = B.plan_buckets(A.ptr, A.col, A.ptr, vwords=2, dma_fill="auto")
    assert not any(c.fill for c in plan.classes)


def test_chunked_fallback_with_fill_frontend():
    """Row-chunked execution composes with the Mosaic fill (each chunk
    plans its own fill classes)."""
    from mh_spgemm_tpu.pipeline import spgemm_chunked
    A = gen.banded(240, band=10, nnz_per_row=8, seed=19)
    cfg = SpGEMMConfig(mode="bucketed", dma_fill="interpret",
                       min_bucket_width=16)
    C = spgemm_chunked(A, A, config=cfg, max_products=4000)
    assert C.equals(oracle_spgemm(A, A), tol=1e-9)
