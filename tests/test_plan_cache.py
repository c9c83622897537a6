"""Capacity cache (bench/plan_cache.py) + plan warming
(ops/bucketed.warm_plan_from_crow, ops/blockdense.warm_blockplan_from_crow)
+ class consolidation: a cache-warmed fresh plan must be indistinguishable
from one that learned its capacities through the cold totals fetch."""

import numpy as np
import pytest

from mh_spgemm_tpu import CSR, SpGEMMConfig, Timing, oracle_spgemm, verify
from mh_spgemm_tpu.bench import gen, plan_cache
from mh_spgemm_tpu.ops.bucketed import plan_buckets, warm_plan_from_crow
from mh_spgemm_tpu.pipeline import (prepare_blockdense_state,
                                    prepare_bucketed_state, spgemm_blockdense,
                                    spgemm_bucketed)


def _crow_of(A):
    import scipy.sparse as sp
    S = sp.csr_matrix((np.ones(A.nnz), A.col[: A.nnz], A.ptr),
                      shape=(A.M, A.N))
    P = (S @ S).tocsr()
    return np.diff(P.indptr).astype(np.int32)


def test_warm_plan_matches_cold_learning():
    A = gen.powerlaw(500, avg_nnz=6, seed=7)
    cfg = SpGEMMConfig(mode="bucketed", min_bucket_width=8)
    # cold: learn capacities through the totals fetch
    cold = prepare_bucketed_state(A, A, cfg)
    C1, cold = spgemm_bucketed(A, A, config=cfg, state=cold)
    assert cold.plan.class_caps is not None
    assert cold.plan.crow_h is not None
    # warm: derive the same capacities from crow alone
    warm = prepare_bucketed_state(A, A, cfg)
    warm_plan_from_crow(warm.plan, _crow_of(A))
    assert warm.plan.class_caps == cold.plan.class_caps
    assert warm.plan.nnz_c == cold.plan.nnz_c
    assert warm.plan.nnz_cap == cold.plan.nnz_cap
    # and the warmed first run (fused path) is oracle-correct
    C2, _ = spgemm_bucketed(A, A, config=cfg, state=warm)
    ref = oracle_spgemm(A, A)
    assert verify(C2.host(), ref, tol=1e-9, raise_on_fail=False)
    assert verify(C1.host(), ref, tol=1e-9, raise_on_fail=False)


def test_plan_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("MHSPGEMM_PLAN_CACHE", str(tmp_path))
    A = gen.powerlaw(300, avg_nnz=5, seed=13)
    cfg = SpGEMMConfig(mode="bucketed", min_bucket_width=8)
    st = prepare_bucketed_state(A, A, cfg)
    assert not plan_cache.try_warm(st, "t", A, "bucketed", cfg)  # miss
    _, st = spgemm_bucketed(A, A, config=cfg, state=st)
    path = plan_cache.save(st, "t", A, "bucketed", cfg)
    assert path and str(tmp_path) in path
    st2 = prepare_bucketed_state(A, A, cfg)
    assert plan_cache.try_warm(st2, "t", A, "bucketed", cfg)      # hit
    assert st2.plan.class_caps == st.plan.class_caps
    C, _ = spgemm_bucketed(A, A, config=cfg, state=st2)
    assert verify(C.host(), oracle_spgemm(A, A), tol=1e-9,
                  raise_on_fail=False)
    # a different config (dtype) must MISS, not mis-warm
    cfg32 = SpGEMMConfig(mode="bucketed", min_bucket_width=8,
                         value_dtype="float32")
    st3 = prepare_bucketed_state(A, A, cfg32)
    assert not plan_cache.try_warm(st3, "t", A, "bucketed", cfg32)
    # a different matrix with same name/sizes must MISS (pattern digest)
    A2 = gen.powerlaw(300, avg_nnz=5, seed=14)
    if A2.nnz == A.nnz:
        st4 = prepare_bucketed_state(A2, A2, cfg)
        assert not plan_cache.try_warm(st4, "t", A2, "bucketed", cfg)


def test_plan_cache_blockdense(tmp_path, monkeypatch):
    monkeypatch.setenv("MHSPGEMM_PLAN_CACHE", str(tmp_path))
    A = gen.banded(256, band=12, nnz_per_row=8, seed=3)
    cfg = SpGEMMConfig(mode="blockdense")
    st = prepare_blockdense_state(A, A, cfg)
    _, st2 = spgemm_blockdense(A, A, config=cfg, state=st)
    assert plan_cache.save(st, "bd", A, "blockdense", cfg)
    fresh = prepare_blockdense_state(A, A, cfg)
    assert plan_cache.try_warm(fresh, "bd", A, "blockdense", cfg)
    assert fresh.plan.nnz_cap == st.plan.nnz_cap
    C, _ = spgemm_blockdense(A, A, config=cfg, state=fresh)
    assert verify(C.host(), oracle_spgemm(A, A), tol=1e-9,
                  raise_on_fail=False)


def test_consolidation_correct_and_bounded():
    # power law produces many natural width classes; consolidation must
    # keep results exact and grow the padded area only modestly
    A = gen.powerlaw(800, avg_nnz=6, seed=21)
    p0 = plan_buckets(A.ptr, A.col, A.ptr, min_width=8)
    import os
    os.environ["MHSPGEMM_CLASS_MERGE_NS"] = "0"
    try:
        p_off = plan_buckets(A.ptr, A.col, A.ptr, min_width=8)
    finally:
        del os.environ["MHSPGEMM_CLASS_MERGE_NS"]
    assert len(p0.classes) <= len(p_off.classes)
    area = lambda p: sum(c.W * c.rb * c.nchunks for c in p.classes)  # noqa
    # the merge threshold bounds padding growth: every merged class paid
    # < merge_ns worth of slots (26 ns each)
    assert area(p0) <= area(p_off) + len(p_off.classes) * (10 ** 6 / 26)
    cfg = SpGEMMConfig(mode="bucketed", min_bucket_width=8)
    C, _ = spgemm_bucketed(A, A, config=cfg)
    assert verify(C.host(), oracle_spgemm(A, A), tol=1e-9,
                  raise_on_fail=False)


def test_forced_spec_sparser_than_natural_grid():
    # distributed union specs may lack small widths after per-shard
    # consolidation: rows must map UP to the next forced width
    A = gen.powerlaw(400, avg_nnz=5, seed=5)
    base = plan_buckets(A.ptr, A.col, A.ptr, min_width=8)
    widths = sorted(c.W for c in base.classes)
    big = max(widths)
    forced = {int(big): (base.classes[-1].rb, base.classes[-1].nchunks,
                         base.classes[-1].eb, False)}
    # drop every width but the largest: all rows must land there
    plan = plan_buckets(A.ptr, A.col, A.ptr, min_width=8, forced=forced)
    assert [c.W for c in plan.classes] == [big]
    rows = plan.classes[0].rows_g
    assert int((rows >= 0).sum()) == sum(
        int((c.rows_g >= 0).sum()) for c in base.classes)
