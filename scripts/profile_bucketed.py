"""Decompose the bucketed fused program's device time, stage by stage.

Builds piecewise jitted programs from the ACTUAL plan of a suite matrix
(warmed from the capacity cache when available) and times each on the
real chip, subtracting the measured null-dispatch round trip:

  null       — trivial fence (the transport floor every run pays)
  seeds      — per-class _expand_seeds only (scatter seeds + hold-scan)
  front      — seeds + the expansion gather (b_words wide gather)
  product    — front + masked multiply
  main       — the full main stage (adds the sort/segsum/pack tail)
  fused      — main + extraction (what the bench runs warm)

Usage: python scripts/profile_bucketed.py scircuit [mac_econ_fwd500 ...]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mh_spgemm_tpu import SpGEMMConfig
from mh_spgemm_tpu.bench import plan_cache
from mh_spgemm_tpu.io import suites
from mh_spgemm_tpu.ops import bucketed as bk
from mh_spgemm_tpu.pipeline import prepare_bucketed_state, spgemm_bucketed
from mh_spgemm_tpu.timing import Timing


_RTT = None


def _fetch1(out):
    """Fetch one element of a FRESH device array — the authoritative
    fence on this transport (block_until_ready acks the enqueue, not the
    execution; a cached host copy returns instantly — fetch via a fresh
    reshape+slice so the transfer really happens)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def _rtt() -> float:
    """One uncached tiny-fetch round trip through the relay (seconds)."""
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1)
        o = f(jnp.zeros((8,), jnp.int32))
        _fetch1(o)
        ts = []
        for _ in range(3):
            o = f(jnp.zeros((8,), jnp.int32))
            t0 = time.perf_counter()
            _fetch1(o)
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def _time(fn, *args, iters=10):
    """Pipelined steady-state ms/iteration: dispatch ``iters`` times
    back-to-back (dispatch is async and ~free), fence ONCE with a real
    fetch, subtract the measured fetch round trip.  The cudaEvent
    analogue for a ~32 ms-RTT transport."""
    out = fn(*args)
    _fetch1(out)                      # compile + drain the queue
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch1(out)
    tot = time.perf_counter() - t0
    return max(0.0, tot - rtt) / iters * 1e3


def profile(name: str) -> None:
    config = SpGEMMConfig(mode="bucketed", value_dtype="float64")
    A = suites.load_matrix(name)
    state = prepare_bucketed_state(A, A, config)
    hit = plan_cache.try_warm(state, name, A, "bucketed", config)
    print(f"== {name}: m={A.M} nnz={A.nnz} plan_cache="
          f"{'hit' if hit else 'miss'} df={state.df}")
    # one engine call uploads operands + fixes capacities (cold path if
    # the cache missed)
    C, state = spgemm_bucketed(A, A, config=config, timing=Timing(),
                               state=state)
    jax.block_until_ready(C.val)
    plan = state.plan
    area = sum(c.W * c.rb * c.nchunks for c in plan.classes)
    print(f"   classes={len(plan.classes)} area={area} "
          f"nnz_c={plan.nnz_c} intprod={A.intprod(A)} "
          f"ext={'mosaic' if plan.ext is not None else 'xla'}")
    for c in plan.classes:
        print(f"   class W={c.W} rb={c.rb} nchunks={c.nchunks} "
              f"fill={c.fill} entries={c.eb}")

    null = jax.jit(lambda x: x + 1)
    t_null = _time(null, jnp.zeros((8, 128), jnp.int32))

    specs = tuple(c.spec for c in plan.classes)
    df = state.df

    def stage_program(depth: str):
        @functools.partial(jax.jit, static_argnames=())
        def prog(class_arrays, a_val, b_col, b_val, b_words):
            acc = jnp.zeros((), jnp.float32)
            for (W, rb, nchunks, eb, hp, sp, fill, stride, wrows,
                 out_rows, planar, grp, pre, pf, pfs), arrs in zip(specs,
                                                          class_arrays):
                if fill:
                    continue  # fill classes profiled separately

                def body(*xs):
                    if pre:
                        rows_g, slot_src, slot_aidx = xs
                        if depth in ("seeds", "front", "product",
                                     "tail"):
                            oC, oV, nnz_row = bk._chunk_pre(
                                rows_g, slot_src, slot_aidx, a_val,
                                b_col, b_val, W=W, rb=rb, seg_passes=sp,
                                df=df, vdtype=jnp.float64)
                            return (jnp.sum(oC).astype(jnp.float32)
                                    + jnp.sum(oV.astype(jnp.float32))
                                    + jnp.sum(nnz_row)
                                    .astype(jnp.float32))
                    rows_g, ent_dst, ent_src, ent_len, ent_aidx = xs
                    if depth == "seeds":
                        src0, valid, AV, off = bk._expand_seeds(
                            ent_dst, ent_src, ent_len, ent_aidx, a_val,
                            W=W, rb=rb, hold_passes=hp, df=df)
                        a0 = AV[0] if df else AV
                        return (jnp.sum(src0 + off)
                                .astype(jnp.float32) + jnp.sum(a0))
                    K, bv, valid, AV = bk._front_gather(
                        ent_dst, ent_src, ent_len, ent_aidx, a_val,
                        b_col, b_val, W=W, rb=rb, hold_passes=hp,
                        df=df, b_words=b_words,
                        wk=state.wk if b_words is not None else 0,
                        vdtype=jnp.float64, G=grp)
                    if depth == "front":
                        b0 = bv[0] if df else bv
                        return jnp.sum(K).astype(jnp.float32) + jnp.sum(b0)
                    prod = bk._product(AV, bv, valid, df)
                    if depth == "product":
                        p0 = prod[0] if df else prod
                        return jnp.sum(p0).astype(jnp.float32)
                    oC, oV, nnz_row = bk._chunk_tail(
                        K, prod, rb=rb, seg_passes=sp, df=df, W=W)
                    # consume oV too: a cols-only sum lets XLA DCE the
                    # value pipeline (under-measured 5x in round 5)
                    return (jnp.sum(oC).astype(jnp.float32)
                            + jnp.sum(oV.astype(jnp.float32))
                            + jnp.sum(nnz_row).astype(jnp.float32))

                if nchunks == 1:
                    acc = acc + body(*(x[0] for x in arrs))
                else:
                    def step(carry, xs):
                        return carry + body(*xs), None
                    acc, _ = jax.lax.scan(step, acc, arrs)
            return acc
        return prog

    bw = state.b_words

    # per-class full-body timing (pre classes run _chunk_pre whole)
    def class_program(ki: int, depth: str = "tail"):
        spec = specs[ki]

        @jax.jit
        def prog(class_arrays, a_val, b_col, b_val, b_words):
            (W, rb, nchunks, eb, hp, sp, fill, stride, wrows,
             out_rows, planar, grp, pre, pf, pfs) = spec
            arrs = class_arrays[ki]

            def body(*xs):
                if pf:
                    oC, oV, nnz_row = bk._chunk_planned(
                        *xs, a_val=a_val, b_col=b_col, b_val=b_val,
                        W=W, rb=rb, seg_passes=sp, df=df,
                        tail="on", pf_spec=pfs, vdtype=jnp.float64)
                elif pre:
                    rows_g, slot_src, slot_aidx = xs
                    oC, oV, nnz_row = bk._chunk_pre(
                        rows_g, slot_src, slot_aidx, a_val, b_col,
                        b_val, W=W, rb=rb, seg_passes=sp, df=df,
                        vdtype=jnp.float64)
                elif fill:
                    oC, oV, nnz_row = bk._chunk_fill(
                        *xs, a_val=a_val, pairs2d=None, W=W, rb=rb,
                        hold_passes=hp, seg_passes=sp, stride=stride,
                        wrows=wrows, out_rows=out_rows,
                        vdtype=jnp.float64, interpret=False, df=df)
                else:
                    oC, oV, nnz_row = bk._chunk_esc(
                        *xs, a_val=a_val, b_col=b_col, b_val=b_val,
                        W=W, rb=rb, hold_passes=hp, seg_passes=sp,
                        df=df, vdtype=jnp.float64, b_words=b_words,
                        wk=state.wk if b_words is not None else 0,
                        G=grp)
                wC = jnp.arange(oC.size, dtype=jnp.float32) \
                    .reshape(oC.shape)
                wV = jnp.arange(oV.size, dtype=jnp.float32) \
                    .reshape(oV.shape)
                return (jnp.sum(oC * wC).astype(jnp.float32)
                        + jnp.sum(oV.astype(jnp.float32) * wV)
                        + jnp.sum(nnz_row).astype(jnp.float32))

            (W, rb, nchunks, *_) = spec
            if nchunks == 1:
                return body(*(x[0] for x in arrs))
            def step(carry, xs):
                return carry + body(*xs), None
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), arrs)
            return acc
        return prog

    for ki, c in enumerate(plan.classes):
        try:
            t = _time(class_program(ki), plan.dev, state.a_val,
                      state.b_col, state.b_val, bw)
            slots = c.W * c.rb * c.nchunks
            print(f"   class W={c.W:<5d} slots={slots:<8d} "
                  f"{t:8.2f} ms  {t*1e6/max(1,slots):7.1f} ns/slot")
        except Exception as e:
            print(f"   class W={c.W}: FAILED {type(e).__name__}: {e}")

    results = {"null": t_null}
    for depth in ("seeds", "front", "product", "tail"):
        prog = stage_program(depth)
        try:
            results[depth] = _time(prog, plan.dev, state.a_val,
                                   state.b_col, state.b_val, bw)
        except Exception as e:
            results[depth] = float("nan")
            print(f"   {depth}: FAILED {type(e).__name__}: {e}")

    # main stage (all classes incl. fill) and fused (bench warm path)
    def main_only():
        out = bk.run_bucketed(plan, state.a_val, state.b_col,
                              state.b_val, state.b_pairs,
                              vdtype=jnp.float64, df=df,
                              b_words=bw, wk=state.wk)
        return out[0]
    results["main"] = _time(main_only)

    def fused():
        return bk.run_bucketed_fused(plan, state.a_val, state.b_col,
                                     state.b_val, state.b_pairs,
                                     vdtype=jnp.float64, df=df,
                                     b_words=bw, wk=state.wk)[2]
    results["fused"] = _time(fused)

    n = results["null"]
    print(f"   null dispatch+fence      {n:8.1f} ms")
    prev = 0.0
    for depth in ("seeds", "front", "product", "tail"):
        t = results[depth] - n
        print(f"   {depth:<10} cumulative    {t:8.1f} ms "
              f"(+{t - prev:.1f})")
        if t == t:  # not nan
            prev = t
    print(f"   main (all classes)       {results['main'] - n:8.1f} ms")
    print(f"   fused main+extraction    {results['fused'] - n:8.1f} ms "
          f"(extraction ~{results['fused'] - results['main']:.1f})")


if __name__ == "__main__":
    for nm in (sys.argv[1:] or ["scircuit"]):
        profile(nm)
