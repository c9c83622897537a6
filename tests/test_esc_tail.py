"""Fused Mosaic ESC tail (ops/esc_tail.py) in interpreter mode: the
in-VMEM bitonic sort + segmented double-f32 accumulate + left-pack must
reproduce the XLA tail's semantics exactly (same packed columns, values
within the double-f32 error bound)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mh_spgemm_tpu.ops.esc_tail import (df_mul_xla, dekker_split_np,
                                        df_range_ok, esc_tail,
                                        supported_w2)

I32_MAX = 2**31 - 1


def _ref_tail(keys, vals, row_len):
    """Numpy reference: per row, sort (key, val) by key over the first
    row_len slots, sum duplicate keys, left-pack ascending."""
    rows, w2 = keys.shape
    oK = np.full((rows, w2), I32_MAX, np.int32)
    oV = np.zeros((rows, w2), np.float64)
    nnz = np.zeros(rows, np.int32)
    for r in range(rows):
        n = row_len[r]
        k = keys[r, :n]
        v = vals[r, :n]
        uk = np.unique(k)
        sums = np.array([v[k == u].sum() for u in uk])
        oK[r, : uk.size] = uk
        oV[r, : uk.size] = sums
        nnz[r] = uk.size
    return oK, oV, nnz


def _run(keys, vals, row_len, f64=True):
    rows, w2 = keys.shape
    if f64:
        ah, al = dekker_split_np(vals)
        ones_h = np.ones_like(ah)
        ones_l = np.zeros_like(al)
        ph, pl = df_mul_xla(jnp.asarray(ah), jnp.asarray(al),
                            jnp.asarray(ones_h), jnp.asarray(ones_l))
        vhi = jnp.asarray(np.asarray(ph).view(np.int32))
        vlo = jnp.asarray(np.asarray(pl).view(np.int32))
    else:
        vhi = jnp.asarray(vals.astype(np.float32).view(np.int32))
        vlo = vhi
    ok, oh, ol = esc_tail(jnp.asarray(keys), vhi, vlo,
                          jnp.asarray(row_len), w2=w2, f64=f64,
                          interpret=True)
    ok = np.asarray(ok)
    hi = np.asarray(oh).view(np.float32)
    if f64:
        lo = np.asarray(ol).view(np.float32)
        vals_out = hi.astype(np.float64) + lo.astype(np.float64)
    else:
        vals_out = hi.astype(np.float64)
    return ok, vals_out


@pytest.mark.parametrize("w2", [8, 32, 128, 256, 1024])
def test_tail_matches_reference(w2):
    rng = np.random.default_rng(w2)
    rows = max(8, 2048 // w2)
    row_len = rng.integers(0, w2 + 1, rows).astype(np.int32)
    # duplicate-heavy keys from a small alphabet + garbage beyond len
    keys = rng.integers(0, max(2, w2 // 2), (rows, w2)).astype(np.int32)
    vals = rng.standard_normal((rows, w2))
    ok, ov = _run(keys, vals, row_len, f64=True)
    rK, rV, nnz = _ref_tail(keys, vals, row_len)
    assert np.array_equal(ok, rK)
    live = rK < I32_MAX
    err = np.abs(ov[live] - rV[live])
    tol = 1e-9 * np.maximum(1.0, np.abs(rV[live]))
    assert np.all(err < tol), float(err.max())
    # packed nnz per row recoverable from the column plane
    assert np.array_equal((ok < I32_MAX).sum(axis=1), nnz)


def test_tail_f32():
    rng = np.random.default_rng(7)
    w2, rows = 64, 32
    row_len = rng.integers(0, w2 + 1, rows).astype(np.int32)
    keys = rng.integers(0, 40, (rows, w2)).astype(np.int32)
    vals = rng.standard_normal((rows, w2))
    ok, ov = _run(keys, vals, row_len, f64=False)
    rK, rV, _ = _ref_tail(keys, vals.astype(np.float32).astype(
        np.float64), row_len)
    assert np.array_equal(ok, rK)
    live = rK < I32_MAX
    assert np.allclose(ov[live], rV[live], atol=1e-4, rtol=1e-4)


def test_tail_empty_and_full_rows():
    w2, rows = 16, 8
    keys = np.tile(np.arange(w2, dtype=np.int32)[::-1], (rows, 1))
    vals = np.ones((rows, w2))
    row_len = np.array([0, w2, 1, w2, 0, 3, w2 - 1, 2], np.int32)
    ok, ov = _run(keys, vals, row_len)
    rK, rV, nnz = _ref_tail(keys, vals, row_len)
    assert np.array_equal(ok, rK)
    assert np.array_equal((ok < I32_MAX).sum(axis=1), nnz)


def test_tail_all_same_key():
    """Worst-case duplicates: every product lands on one column."""
    w2, rows = 256, 8
    keys = np.full((rows, w2), 5, np.int32)
    rng = np.random.default_rng(3)
    vals = rng.standard_normal((rows, w2))
    row_len = np.full(rows, w2, np.int32)
    ok, ov = _run(keys, vals, row_len)
    assert np.all(ok[:, 0] == 5)
    assert np.all(ok[:, 1:] == I32_MAX)
    ref = vals.sum(axis=1)
    assert np.allclose(ov[:, 0], ref, atol=1e-9, rtol=1e-9)


def test_cancellation_accuracy():
    """Catastrophic cancellation: pairs (+x, -x) plus a tiny residual;
    the double-f32 path must keep absolute error under 1e-9."""
    w2 = 128
    rows = 8
    rng = np.random.default_rng(11)
    x = rng.uniform(1.0, 100.0, (rows, w2 // 2))
    vals = np.zeros((rows, w2))
    vals[:, 0::2] = x
    vals[:, 1::2] = -x
    vals[:, 1] += 1e-7          # tiny surviving residual
    keys = np.zeros((rows, w2), np.int32)   # all into one column
    row_len = np.full(rows, w2, np.int32)
    ok, ov = _run(keys, vals, row_len)
    ref = vals.sum(axis=1, dtype=np.float64)
    assert np.all(np.abs(ov[:, 0] - ref) < 1e-9)


def test_df_range_guard():
    assert df_range_ok(np.array([1.0]), np.array([2.0]), 1 << 20)
    assert not df_range_ok(np.array([1e20]), np.array([1e20]), 4)
    assert not df_range_ok(np.array([np.inf]), np.array([1.0]), 4)


def test_supported_widths():
    assert supported_w2(2) and supported_w2(8) and supported_w2(65536)
    assert not supported_w2(1) and not supported_w2(3 << 10)
    assert not supported_w2(1 << 17)


# ---------------------------------------------------------------------------
# Engine-level wiring (config.esc_tail): the bucketed engine with the
# Mosaic tail must match the oracle on pow2 AND non-pow2 width classes
# (non-pow2 classes fall back to the XLA tail inside the same program)
# ---------------------------------------------------------------------------

def _engine_run(A, dtype, warm=2):
    from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm
    from mh_spgemm_tpu.pipeline import spgemm_bucketed
    cfg = SpGEMMConfig(mode="bucketed", value_dtype=dtype,
                       dma_fill="interpret", esc_tail="interpret")
    ref = oracle_spgemm(A, A)
    tol = 1e-9 if dtype == "float64" else 1e-4
    state = None
    for _ in range(warm):          # cold path, then fused warm path
        C, state = spgemm_bucketed(A, A, config=cfg, state=state)
        assert C.host().equals(ref, tol=tol)


def test_engine_mosaic_tail_f64_df():
    from mh_spgemm_tpu.bench import gen
    _engine_run(gen.powerlaw(300, avg_nnz=5, seed=42), "float64")


def test_engine_mosaic_tail_f32():
    from mh_spgemm_tpu.bench import gen
    _engine_run(gen.banded(200, band=12, nnz_per_row=6, seed=1),
                "float32")


def test_engine_mosaic_tail_engages(monkeypatch):
    """The kernel actually runs for a pow2-width class (not silently
    falling back to the XLA tail)."""
    import mh_spgemm_tpu.ops.esc_tail as et
    from mh_spgemm_tpu import SpGEMMConfig, spgemm_host
    from mh_spgemm_tpu.bench import gen
    calls = {"n": 0}
    real = et.esc_tail

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(et, "esc_tail", counting)
    A = gen.random_uniform(64, nnz_per_row=8, seed=3)   # W=8/16 classes
    cfg = SpGEMMConfig(mode="bucketed", dma_fill="interpret",
                       esc_tail="interpret")
    spgemm_host(A, None, config=cfg)
    assert calls["n"] > 0


def test_engine_flat_tail_pre_classes(monkeypatch):
    """The FLAT Mosaic tail (esc_tail_flat) engages for precomputed
    gather classes (dma_fill off so no class is forced to fill) and the
    engine matches the oracle cold and warm."""
    import mh_spgemm_tpu.ops.esc_tail as et
    from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm
    from mh_spgemm_tpu.bench import gen
    from mh_spgemm_tpu.pipeline import spgemm_bucketed
    calls = {"n": 0}
    real = et.esc_tail_flat

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(et, "esc_tail_flat", counting)
    A = gen.powerlaw(300, avg_nnz=5, seed=42)
    cfg = SpGEMMConfig(mode="bucketed", value_dtype="float64",
                       dma_fill="off", esc_tail="interpret")
    ref = oracle_spgemm(A, A)
    state = None
    for _ in range(2):
        C, state = spgemm_bucketed(A, A, config=cfg, state=state)
        assert C.host().equals(ref, tol=1e-9)
    assert calls["n"] > 0
    assert all(c.pre and not c.fill for c in state.plan.classes)


def test_tail_tiny_widths():
    """w2=2 and w2=4 segments (one/five compare-exchanges): road-network
    suites put most rows here."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    for w2 in (2, 4):
        rows = 512
        K = rng.integers(0, 3, (rows, w2)).astype(np.int32)
        n = rng.integers(1, w2 + 1, rows).astype(np.int32)
        K[np.arange(w2)[None, :] >= n[:, None]] = 2**31 - 1
        K.sort(axis=1)
        H = rng.standard_normal((rows, w2)).astype(np.float32)
        L = (H * 1e-9).astype(np.float32)
        bits = lambda x: jnp.asarray(x).view(jnp.int32)
        ok, oh, ol = esc_tail(jnp.asarray(K), bits(H), bits(L),
                              jnp.asarray(n), w2=w2, f64=True,
                              interpret=True)
        ok = np.asarray(ok)
        for r in range(rows):
            cols = K[r][K[r] < 2**31 - 1]
            want = np.unique(cols)
            got = ok[r][ok[r] < 2**31 - 1]
            assert np.array_equal(got, want), (w2, r)
