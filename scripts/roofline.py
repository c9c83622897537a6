"""Per-class roofline audit of the bucketed engine on the real chip.

BASELINE.md: "each kernel roofline-audited per chip".  The bench's
single blended ns_per_product can hide a slow class behind a fast one
(VERDICT round-4 missing #4); this times every row class's main-stage
program SEPARATELY and reports achieved ns/slot, ns/product, and
achieved GB/s against the class's model floor:

  gather class:  takes frontend ~_GATHER_NS_PER_SLOT ns/slot + tail
  fill class:    step/run/slot model (ops/bucketed._attach_fill_plan)

Writes/merges data/ROOFLINE_r5.json.
Usage: python scripts/roofline.py scircuit webbase-1M cage12
"""
import functools
import json
import os
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

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "ROOFLINE_r5.json")


def _time(fn, *args, iters=5):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def audit(name: str) -> dict:
    config = SpGEMMConfig(mode="bucketed", value_dtype="float64")
    A = suites.load_matrix(name)
    state = prepare_bucketed_state(A, A, config)
    plan_cache.try_warm(state, name, A, "bucketed", config)
    C, state = spgemm_bucketed(A, A, config=config, timing=Timing(),
                               state=state)
    jax.tree.map(np.asarray, C.ptr[:1])
    plan = state.plan
    df = state.df
    specs = tuple(c.spec for c in plan.classes)

    t_null = _time(jax.jit(lambda x: x + 1), jnp.zeros((8, 128),
                                                       jnp.int32))

    def one_class(ki: int):
        @jax.jit
        def prog(class_arrays, a_val, b_col, b_val, pairs2d, b_words):
            (W, rb, nchunks, eb, hp, sp, fill, stride, wrows, out_rows,
             planar, grp, pre, pf, pfs) = specs[ki]
            arrs = class_arrays[ki]
            if fill:
                body = functools.partial(
                    bk._chunk_fill, a_val=a_val, pairs2d=pairs2d, W=W,
                    rb=rb, hold_passes=hp, seg_passes=sp, stride=stride,
                    wrows=wrows, out_rows=out_rows, vdtype=jnp.float64,
                    interpret=False, df=df)
            elif pf:
                aw = (state.a_words if state.a_words is not None
                      else jnp.zeros((2,), jnp.int32))
                body = functools.partial(
                    bk._chunk_planned, a_val=a_val, b_col=b_col,
                    b_val=b_val, a_words=aw, W=W, rb=rb,
                    seg_passes=sp, df=df, tail="on", pf_spec=pfs,
                    vdtype=jnp.float64)
            elif pre:
                body = functools.partial(
                    bk._chunk_pre, a_val=a_val, b_col=b_col,
                    b_val=b_val, W=W, rb=rb, seg_passes=sp, df=df,
                    vdtype=jnp.float64)
            else:
                body = functools.partial(
                    bk._chunk_esc, a_val=a_val, b_col=b_col, b_val=b_val,
                    W=W, rb=rb, hold_passes=hp, seg_passes=sp, df=df,
                    b_words=b_words, wk=state.wk if b_words is not None
                    else 0, vdtype=jnp.float64, G=grp)
            if nchunks == 1:
                oC, oV, nnz_row = body(*(x[0] for x in arrs))
            else:
                def step(carry, xs):
                    return carry, body(*xs)
                _, (oC, oV, nnz_row) = jax.lax.scan(step, None, arrs)
            # consume EVERY output, iota-weighted — plain sums are
            # permutation-invariant and let XLA delete the sorts (the
            # first round-5 audit under-measured 5x via value DCE, the
            # second via sort elimination)
            wC = jnp.arange(oC.size, dtype=jnp.float32).reshape(oC.shape)
            wV = jnp.arange(oV.size, dtype=jnp.float32).reshape(oV.shape)
            return (jnp.sum(oC * wC).astype(jnp.float32)
                    + jnp.sum(oV.astype(jnp.float32) * wV)
                    + jnp.sum(nnz_row).astype(jnp.float32))
        return prog

    pairs = state.b_pairs if state.b_pairs is not None else \
        jnp.zeros((1, 128), jnp.int32)
    rows = []
    for ki, c in enumerate(plan.classes):
        slots = c.W * c.rb * c.nchunks
        live = int((c.rows_g >= 0).sum())
        prods = None  # per-class product count from entry lengths
        prods = int(sum(int(c.ent_len[k].sum()) for k in
                        range(c.nchunks)))
        try:
            ms = _time(one_class(ki), plan.dev, state.a_val, state.b_col,
                       state.b_val, pairs, state.b_words) - t_null
        except Exception as e:
            rows.append({"W": c.W, "error": f"{type(e).__name__}: {e}"})
            continue
        # model floor for this class (ns): frontend + ~3 ns/slot tail
        if c.fill:
            s_total = c.win_row.shape[1] * c.nchunks
            r_total = int(c.win_row[..., 1].sum())
            floor_ms = (s_total * bk._FILL_STEP_US * 1e-3
                        + r_total * bk._FILL_RUN_US * 1e-3
                        + slots * (bk._FILL_NS_PER_SLOT + 3.0) * 1e-6)
        elif c.pf:
            # planned frontend: windowed gather + route + tail, measured
            # ~5-8 ns/slot all-in (ops/planned.py)
            floor_ms = slots * 5.0 * 1e-6
        else:
            floor_ms = slots * (bk._GATHER_NS_PER_SLOT + 3.0) * 1e-6
        # minimum bytes: each product moves col + value words once in,
        # packed result once out (df32: 4 + 8 in, 12 out)
        bytes_min = prods * 12 + live * 12
        rows.append({
            "W": c.W, "G": c.G, "frontend":
                ("fill" if c.fill else f"grouped{c.G}" if c.G > 1
                 else "planned" if c.pf else "pre" if c.pre
                 else "gather"),
            "rows": live, "slots": slots, "products": prods,
            "ms": round(ms, 3),
            "ns_per_slot": round(ms * 1e6 / max(1, slots), 2),
            "ns_per_product": round(ms * 1e6 / max(1, prods), 2),
            "floor_ms": round(floor_ms, 3),
            "vs_floor": round(ms / max(1e-9, floor_ms), 2),
            "achieved_gbs": round(bytes_min / max(1e-9, ms) * 1e-6, 2),
        })
        print(json.dumps({"matrix": name, **rows[-1]}), flush=True)
    return {"classes": rows, "null_ms": round(t_null, 1),
            "intprod": int(plan.intprod), "df": bool(df)}


def main():
    names = sys.argv[1:] or ["scircuit"]
    try:
        with open(OUT) as f:
            out = json.load(f)
    except Exception:
        out = {}
    for name in names:
        try:
            out[name] = audit(name)
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: FAILED {out[name]['error']}", flush=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
        print(f"{name}: written to {OUT}", flush=True)


if __name__ == "__main__":
    main()
