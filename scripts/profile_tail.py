"""Stage-by-stage timing of the bucketed fill-path chunk pipeline on the
real chip: where do the ~10-12 ns/slot actually go?

Cumulative-prefix timing over the LARGEST fill class of a suite matrix:
  fill       ragged_fill kernel only
  deint      + stride-3 deinterleave / reshape
  bitcast    + i32 words -> values (f64 emulated; df: 2x f32, free)
  av         + A-value hold-scan broadcast
  prod       + AV * bv masked multiply (df: Veltkamp two-product)
  sort1      + batched in-row sort by column
  segsum     + segmented sum over equal-column runs (df: two-sum)
  pack       + rank + second sort (left-pack)   == full _chunk_fill

Run:  python scripts/profile_tail.py [matrix] [float64|float32|df]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

from mh_spgemm_tpu.config import SpGEMMConfig           # noqa: E402
from mh_spgemm_tpu.io import suites                     # noqa: E402
from mh_spgemm_tpu.ops import bucketed as B             # noqa: E402
from mh_spgemm_tpu.ops.bucketed import (                # noqa: E402
    _chunk_tail, _front_fill, _hold_scan_rows, _seg_sum_rows,
    _seg_sum_rows_df, _product, _I32_MAX)
from mh_spgemm_tpu.ops.esc_tail import (                # noqa: E402
    dekker_split_np, df_mul_xla)
import functools                                         # noqa: E402


def fetch_ms(fn, *args, reps=3):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cant"
    dt = sys.argv[2] if len(sys.argv) > 2 else "float64"
    df = dt == "df"
    if df:
        dt = "float64"
    vdtype = jnp.dtype(dt)
    vwords = 2 if vdtype == jnp.float64 else 1
    A = suites.load_matrix(name)
    cfg = SpGEMMConfig(mode="bucketed", value_dtype=dt)
    plan = B.plan_buckets(A.ptr, A.col, A.ptr,
                          min_width=cfg.min_bucket_width,
                          area_cap=cfg.bucket_area_cap,
                          vwords=vwords, dma_fill="auto")
    fills = [c for c in plan.classes if c.fill]
    print(f"{name}: intprod={plan.intprod} classes="
          f"{[(c.W, c.rb, c.nchunks, c.fill) for c in plan.classes]}")
    if not fills:
        print("no fill classes; nothing to profile")
        return
    c = max(fills, key=lambda c: c.W * c.rb * c.nchunks)
    slots = c.W * c.rb * c.nchunks
    print(f"profiling class W={c.W} rb={c.rb} nchunks={c.nchunks} "
          f"eb={c.eb} slots={slots} ({slots / plan.intprod:.0%} of "
          "intprod area)")

    if df:
        a_val = jnp.asarray(np.stack(dekker_split_np(
            A.val.astype(np.float64))))
    else:
        a_val = jnp.asarray(A.val.astype(dt))
    pairs = jnp.asarray(B.build_pairs(
        A.col, A.val.astype(dt), vwords, B.pairs_wrows_max(plan), df=df))
    B.upload_plan(plan)
    ci = plan.classes.index(c)
    arrs = plan.dev[ci]
    stride = c.stride

    def spot(x):
        if isinstance(x, tuple):
            return sum(jnp.sum(p[:, ::64]).astype(jnp.float32) for p in x)
        return jnp.sum(x[:, ::64]).astype(jnp.float32)

    def chunk_stage(stage, ent_dst, ent_len, ent_aidx, row_len, win_row,
                    runs):
        import mh_spgemm_tpu.ops.ragged_fill as rf
        W, rb = c.W, c.rb
        slab3 = rf.ragged_fill(win_row, runs, pairs,
                               out_rows=c.out_rows, wrows=c.wrows,
                               interpret=False)
        if stage == "fill":
            return jnp.sum(slab3[::64, ::64].astype(jnp.int64))
        flat3 = slab3.reshape(-1)[: rb * W * stride].reshape(
            rb * W, stride)
        K0 = flat3[:, 0].reshape(rb, W)
        if stage == "deint":
            return jnp.sum(K0[:, ::64].astype(jnp.int64))
        if df:
            bv = (jax.lax.bitcast_convert_type(
                      flat3[:, 1], jnp.float32).reshape(rb, W),
                  jax.lax.bitcast_convert_type(
                      flat3[:, 2], jnp.float32).reshape(rb, W))
        elif stride == 3:
            bv = jax.lax.bitcast_convert_type(
                flat3[:, 1:3], jnp.float64).reshape(rb, W).astype(vdtype)
        else:
            bv = jax.lax.bitcast_convert_type(
                flat3[:, 1], jnp.float32).reshape(rb, W).astype(vdtype)
        if stage == "bitcast":
            return jnp.sum(K0[:, ::64].astype(jnp.int64)) + spot(bv)
        RW = rb * W
        if df:
            s_av = (jnp.zeros((RW,), jnp.float32).at[ent_dst].set(
                        a_val[0][ent_aidx], mode="drop").reshape(rb, W),
                    jnp.zeros((RW,), jnp.float32).at[ent_dst].set(
                        a_val[1][ent_aidx], mode="drop").reshape(rb, W))
        else:
            s_av = (jnp.zeros((RW,), a_val.dtype).at[ent_dst].set(
                a_val[ent_aidx], mode="drop").reshape(rb, W),)
        starts = jnp.zeros((RW,), bool).at[ent_dst].set(
            True, mode="drop").reshape(rb, W)
        AV = _hold_scan_rows(s_av, starts, c.hold_passes)
        if not df:
            AV = AV[0]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (rb, W), 1)
                 < row_len[:, None])
        K = jnp.where(valid, K0, _I32_MAX)
        if stage == "av":
            return jnp.sum(K[:, ::64].astype(jnp.int64)) + spot(AV)
        prod = _product(AV, bv, valid, df)
        if stage == "prod":
            return jnp.sum(K[:, ::64].astype(jnp.int64)) + spot(prod)
        if df:
            sK, sH, sL = jax.lax.sort((K,) + prod, num_keys=1,
                                      dimension=1)
            sV = (sH, sL)
        else:
            sK, sV = jax.lax.sort((K, prod), num_keys=1, dimension=1)
        if stage == "sort1":
            return jnp.sum(sK[:, ::64].astype(jnp.int64)) + spot(sV)
        new = jnp.concatenate(
            [jnp.ones((rb, 1), bool), sK[:, 1:] != sK[:, :-1]], axis=1)
        if df:
            run = _seg_sum_rows_df(sV[0], sV[1], new, c.seg_passes)
        else:
            run = _seg_sum_rows(sV, new, c.seg_passes)
        if stage == "segsum":
            return jnp.sum(sK[:, ::64].astype(jnp.int64)) + spot(run)
        ends = (jnp.concatenate(
            [new[:, 1:], jnp.ones((rb, 1), bool)], axis=1)
            & (sK < _I32_MAX))
        nnz_row = jnp.sum(ends, axis=1, dtype=jnp.int32)
        rank = jnp.cumsum(ends, axis=1, dtype=jnp.int32) - 1
        key2 = jnp.where(ends, rank, _I32_MAX)
        if df:
            _, oC, oH, oL = jax.lax.sort((key2, sK) + run, num_keys=1,
                                         dimension=1)
            oV = (oH, oL)
        else:
            _, oC, oV = jax.lax.sort((key2, sK, run), num_keys=1,
                                     dimension=1)
            oV = (oV,)
        return (jnp.sum(oC[:, ::64].astype(jnp.int64)) + spot(oV)
                + jnp.sum(nnz_row.astype(jnp.int64)))

    stages = ["fill", "deint", "bitcast", "av", "prod", "sort1",
              "segsum", "pack"]

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run_class(arrs, stage):
        rows_g, ent_dst, ent_len, ent_aidx, row_len, win_row, runs = arrs
        if c.nchunks == 1:
            return chunk_stage(stage, ent_dst[0], ent_len[0],
                               ent_aidx[0], row_len[0], win_row[0],
                               runs[0])

        def step(carry, xs):
            _rg, ed, el, ea, rl, wr, rn = xs
            return carry + chunk_stage(stage, ed, el, ea, rl, wr, rn), None

        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float64),
                              (rows_g, ent_dst, ent_len, ent_aidx,
                               row_len, win_row, runs))
        return tot

    null = fetch_ms(jax.jit(lambda x: jnp.sum(x)),
                    jnp.ones((8,), jnp.float32))
    print(f"null latency {null:.1f} ms")
    prev = 0.0
    for st in stages:
        ms = fetch_ms(run_class, arrs, st) - null
        print(f"  {st:8s} cum {ms:9.1f} ms  delta {ms - prev:9.1f} ms  "
              f"({(ms - prev) * 1e6 / slots:6.2f} ns/slot)")
        prev = ms


if __name__ == "__main__":
    main()
