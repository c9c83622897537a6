"""Stage-by-stage probe of the bucketed cold path on the real chip,
with a wall-clock print after every step — for diagnosing where a cold
run stalls (round-5: scircuit cold runs hung >10 min with no output).

Usage: python scripts/stage_probe.py [matrix] [mode-overrides...]
"""
import sys
import time

sys.path.insert(0, ".")

T0 = time.time()


def log(msg):
    print(f"[+{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "scircuit"
    log("importing")
    import jax
    import numpy as np

    from mh_spgemm_tpu import SpGEMMConfig
    from mh_spgemm_tpu.io import suites
    from mh_spgemm_tpu.ops import bucketed as bk
    from mh_spgemm_tpu.pipeline import prepare_bucketed_state
    log(f"devices: {jax.devices()}")
    A = suites.load_matrix(name)
    log(f"loaded {name}: m={A.M} nnz={A.nnz}")
    config = SpGEMMConfig(mode="bucketed", value_dtype="float64")
    state = prepare_bucketed_state(A, A, config)
    plan = state.plan
    log(f"planned: {len(plan.classes)} classes, df={state.df}, "
        f"area={sum(c.W * c.rb * c.nchunks for c in plan.classes)}")
    for c in plan.classes:
        log(f"  W={c.W} G={c.G} rb={c.rb} nch={c.nchunks} eb={c.eb} "
            f"fill={c.fill}")

    import jax.numpy as jnp

    from mh_spgemm_tpu.ops import esc_tail as esc
    if state.df:
        state.a_val = jnp.asarray(np.stack(esc.dekker_split_np(
            A.val.astype(np.float64))))
        state.b_val = state.a_val
    else:
        state.a_val = jnp.asarray(A.val.astype(config.vdtype))
        state.b_val = state.a_val
    state.b_col = jnp.asarray(A.col)
    np.asarray(state.b_col[:1])
    log("operands uploaded")
    if bk.needs_pairs(plan):
        builder = (bk.build_pairs_planar if any(
            c.planar for c in plan.classes) else bk.build_pairs)
        state.b_pairs = jnp.asarray(builder(
            A.col, A.val.astype(config.vdtype), 2,
            bk.pairs_wrows_max(plan), df=state.df))
        np.asarray(state.b_pairs[:1, :1])
        log("pairs uploaded")
    bk.upload_plan(plan)
    for t in plan.dev:
        for x in t:
            np.asarray(x[:1].reshape(-1)[:1]) if hasattr(x, "shape") \
                else None
    log("plan descriptors uploaded")

    out = bk.run_bucketed(plan, state.a_val, state.b_col, state.b_val,
                          state.b_pairs, vdtype=config.vdtype,
                          df=state.df)
    log("main program dispatched (traced+compiled)")
    crow, cptr, totals, slabs = out
    t = np.asarray(totals)
    log(f"main executed: totals={t.tolist()}")
    cptr_h, ccol, cval = bk.finish_bucketed(plan, out, config.vdtype,
                                            df=state.df)
    log("extraction dispatched")
    np.asarray(cval[:1])
    log(f"extraction executed: nnz_c={plan.nnz_c}")
    # warm fused
    for i in range(3):
        t0 = time.time()
        cptr_h, ccol, cval = bk.run_bucketed_fused(
            plan, state.a_val, state.b_col, state.b_val, state.b_pairs,
            vdtype=config.vdtype, df=state.df)
        np.asarray(cval[:1])
        log(f"fused iter {i}: {(time.time() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
