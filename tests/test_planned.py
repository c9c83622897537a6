"""Planned VMEM frontend kernels (ops/planned.py), interpret mode:
windowed gather schedule + static routing masks vs numpy."""
import numpy as np
import jax.numpy as jnp
import pytest

from mh_spgemm_tpu.ops import planned as pn


@pytest.mark.parametrize("S,T,seed", [(1000, 4096, 0), (5000, 2000, 1),
                                      (100, 100000, 2), (1, 64, 3)])
def test_pgather_schedule_and_kernel(S, T, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, T, S).astype(np.int64)
    wblk, rowsel, lane, perm = pn.plan_pgather(src, T)
    # schedule invariants
    Gb = wblk.shape[0]
    assert rowsel.shape == (Gb * 8, 128)
    assert lane.shape == (Gb * 8, 128)
    assert perm.shape == (Gb * 1024,)
    live = perm >= 0
    assert live.sum() == S
    # every scheduled position holds a distinct source slot (duplicates
    # of a WORD are fine; duplicates of a slot are not)
    assert sorted(perm[live].tolist()) == list(range(S))
    tabs = [rng.integers(0, 1 << 30, T + 1200).astype(np.int32)
            for _ in range(3)]
    outs = pn.pgather([jnp.asarray(t) for t in tabs],
                      jnp.asarray(wblk), jnp.asarray(rowsel),
                      jnp.asarray(lane), interpret=True)
    for t, o in zip(tabs, outs):
        o = np.asarray(o)
        assert np.array_equal(o[live], t[src[perm[live]]])


@pytest.mark.parametrize("m,seed", [(1024, 0), (4096, 1), (16384, 2)])
def test_proute_permutation(m, seed):
    rng = np.random.default_rng(seed)
    dest = rng.permutation(m).astype(np.int64)
    masks, nstages = pn.plan_route(dest, m)
    vals = [rng.integers(0, 1 << 30, m).astype(np.int32)
            for _ in range(2)]
    outs = pn.proute([jnp.asarray(v) for v in vals],
                     jnp.asarray(masks), nstages, interpret=True)
    for v, o in zip(vals, outs):
        ref = np.zeros(m, np.int32)
        ref[dest] = v
        assert np.array_equal(np.asarray(o), ref)


def test_proute_hold_propagate():
    """Route run-head records to their head slots, then propagate down
    aligned w2=8 segments."""
    rng = np.random.default_rng(0)
    m = 1024
    w2 = 8
    # heads at segment starts plus a few mid-segment
    heads = np.zeros(m, bool)
    heads[::w2] = True
    heads[rng.choice(m, 100, replace=False)] = True
    head_pos = np.flatnonzero(heads)
    E = head_pos.size
    vals = rng.integers(1, 1 << 20, E).astype(np.int32)
    # inputs: E records first, pads after; dest = head positions
    dest = np.concatenate(
        [head_pos, np.setdiff1d(np.arange(m), head_pos)]).astype(
            np.int64)
    masks, nstages = pn.plan_route(dest, m)
    vin = np.concatenate([vals, np.zeros(m - E, np.int32)])
    flags = heads.astype(np.int32)
    outs = pn.proute([jnp.asarray(vin)], jnp.asarray(masks), nstages,
                     hold_w2=w2, flags=jnp.asarray(flags),
                     interpret=True)
    out = np.asarray(outs[0])
    # numpy reference: value at slot = value of last head <= slot within
    # its aligned segment
    ref = np.zeros(m, np.int32)
    ref[head_pos] = vals
    for i in range(m):
        if not heads[i]:
            ref[i] = ref[i - 1] if i % w2 else 0
    assert np.array_equal(out, ref)


def test_engine_planned_frontend():
    """Engine-level: the planned frontend (pf classes) engages under
    planned="interpret" and matches the oracle cold + warm, f64-df and
    f32, including multi-chunk classes."""
    from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm
    from mh_spgemm_tpu.bench import gen
    from mh_spgemm_tpu.pipeline import spgemm_bucketed
    for dtype, seed in [("float64", 42), ("float32", 7)]:
        A = gen.powerlaw(400, avg_nnz=5, seed=seed)
        cfg = SpGEMMConfig(mode="bucketed", value_dtype=dtype,
                           dma_fill="off", esc_tail="interpret",
                           planned="interpret")
        ref = oracle_spgemm(A, A)
        tol = 1e-9 if dtype == "float64" else 1e-4
        state = None
        for _ in range(2):
            C, state = spgemm_bucketed(A, A, config=cfg, state=state)
            assert C.host().equals(ref, tol=tol)
        assert any(c.pf for c in state.plan.classes)
