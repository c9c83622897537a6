"""Masked (MH-faithful) engine on the bucketed class machinery.

Round-1's masked engine ran the tile-mask pipeline at FLAT granularity:
one product-length sort plus a product-granularity scatter-add, capped by
``masked_max_products``.  This rebuild keeps the reference's semantic
identity — a compressed 32-column tile bitmap of B and an EXACT symbolic
stage that ORs tile masks and popcounts (``inc/Calculate_C_nnz.cuh:
410-835``) — and executes both stages inside the bucketed engine's
fixed-width row classes:

* per chunk, a TILE slab [rb, Wt] is expanded from the mask matrix
  (Mosaic ragged fill of host-planned (tilecol, tilemask) runs, or XLA
  gathers), sorted by tile column, OR-accumulated over equal-tile runs
  (segmented OR = the ``atomicOr`` analogue), and popcounted — the
  exact nnz of every C row, and C.ptr, come from this stage BEFORE any
  numeric work, exactly the reference's two-stage contract;
* the NUMERIC stage shares the bucketed expansion frontend and tail
  (sort by column, compensated segment sum, left-pack; double-f32
  value pipeline under f64).  An earlier rebuild derived every
  product's destination by the reference's closed-form popcount rank
  ``base(tile) + popc(mask & (bit-1))`` (``inc/numeric.cuh:215-258``
  with the hash probe replaced by rank arithmetic); on hardware the
  per-slot gather of (rank base, OR mask) from the tile slab cost
  ~2x13 ns/slot — more than the whole sort tail whose left-pack
  produces the same dense ranks (rank is monotone in column).  The
  popcount-rank arithmetic lives on in the symbolic stage's nnz sums.

No product-granularity flat arrays, no scatter-add, no size cap: the
engine runs everything the bucketed engine runs, sharing its planner,
chunking, extraction and state caching.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TILE_BITS
from .bucketed import (BucketPlan, _chunk_tail, _front_fill,
                       _front_gather, _hold_scan_rows, _log2_bound,
                       _product,
                       _plan_runs_chunk, _fill_wrows, _I32_MAX,
                       _FILL_STEP_US, _FILL_RUN_US, _FILL_NS_PER_SLOT,
                       _FILL_EPG, _GATHER_NS_PER_SLOT, bucketed_extract,
                       bucketed_extract_mosaic, build_pairs_planar)
from . import ragged_fill as rf
from .shapes import quantize

_TILE_LOW = (1 << TILE_BITS) - 1
_TILE_STRIDE = 2               # [tilecol, tilemask] i32 words per tile


def host_mask_matrix(b_ptr: np.ndarray, b_col: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CPU tile-mask matrix of B (the numpy twin of ops/mask.mask_stage,
    reference ``inc/Form_mask_matrix_B.cuh:390-751``): per B row, one
    ``(tilecol, tilemask)`` pair per distinct 32-column tile, tiles in
    ascending column order (B's columns are CSR-sorted).  Feeds the
    Mosaic tile-slab fill's transport stream — built host-side because
    the run planning needs the counts anyway and mask formation is
    excluded from the timed total (src/Timing.cpp:39-42)."""
    btile = (b_col >> TILE_BITS).astype(np.int64)
    rows_of = np.repeat(np.arange(b_ptr.shape[0] - 1),
                        np.diff(b_ptr))
    starts = np.ones(b_col.shape[0], bool)
    starts[1:] = (rows_of[1:] != rows_of[:-1]) | (btile[1:] != btile[:-1])
    tiles_per_row = np.bincount(rows_of[starts],
                                minlength=b_ptr.shape[0] - 1)
    tilecol = btile[starts].astype(np.int32)
    bit = (np.uint32(1) << (b_col & _TILE_LOW).astype(np.uint32))
    if b_col.size:
        tilemask = np.bitwise_or.reduceat(bit, np.flatnonzero(starts))
    else:
        tilemask = np.zeros(0, np.uint32)
    return tiles_per_row.astype(np.int32), tilecol, \
        tilemask.astype(np.uint32)


def plan_masked_extras(plan: BucketPlan, a_ptr: np.ndarray,
                       a_col: np.ndarray, b_ptr: np.ndarray,
                       b_col: np.ndarray, dma_fill: str = "off"
                       ) -> Tuple[np.ndarray, List[dict],
                                  "np.ndarray | None"]:
    """Host-side additions for the masked engine: B's per-row tile
    counts; per class the static TILE slab width Wt (quantized max
    per-row tile total over the class rows); and, when ``dma_fill``
    allows and the cost model agrees, a Mosaic ragged-fill plan for the
    TILE slab — the same run-merging machinery the product slab uses
    (VERDICT round-2 item 6: stream the (tilecol, tilemask) spans like
    the product slab instead of per-element XLA gathers).  Returns
    (tiles_per_row, extras, tile_pairs-stream-or-None)."""
    tiles_per_row, tilecol_h, tilemask_h = host_mask_matrix(b_ptr, b_col)
    btileptr = np.concatenate(
        [[0], np.cumsum(tiles_per_row)]).astype(np.int64)
    # per C row: total tiles streamed = sum over entries (fub_row)
    tcs = np.concatenate([[0], np.cumsum(tiles_per_row[a_col])])
    t_row = tcs[a_ptr[1:]] - tcs[a_ptr[:-1]]
    fill_ok = (dma_fill in ("auto", "on", "interpret")
               and int(btileptr[-1]) * _TILE_STRIDE < 2**31
               and (rf.on_tpu() or dma_fill == "interpret"))
    force = dma_fill in ("on", "interpret")
    extras = []
    any_fill = False
    for c in plan.classes:
        rows = c.rows_g.reshape(-1)
        live = rows[rows >= 0]
        wt = int(t_row[live].max()) if live.size else 1
        wt = max(8, quantize(wt))
        e = {"Wt": wt, "t_hold": _log2_bound(wt), "t_fill": False,
             "t_wrows": 0, "t_out_rows": 0}
        extras.append(e)
        if not fill_ok:
            continue
        # tile entry descriptors per chunk: src = tile start of the hit
        # B row, len = its tile count, dst = within-row running offset
        # in the [rb, Wt] tile slab (entries are in dst order)
        wrows = _fill_wrows(wt, 1)      # planar: geometry in elements
        wins, runss, tds = [], [], []
        s_total = r_total = 0
        t_row_len = np.zeros((c.nchunks, c.rb), np.int32)
        for k in range(c.nchunks):
            lv = c.ent_len[k] > 0
            cols = a_col[c.ent_aidx[k]]
            tl = np.where(lv, tiles_per_row[cols], 0).astype(np.int64)
            slot = np.minimum(c.ent_dst[k] // c.W, c.rb)
            cs = np.cumsum(tl)
            first = np.ones(tl.size, bool)
            first[1:] = slot[1:] != slot[:-1]
            base = np.maximum.accumulate(np.where(first, cs - tl, 0))
            toff = cs - tl - base
            tdst = np.where(lv & (slot < c.rb), slot * wt + toff,
                            c.rb * wt).astype(np.int64)
            tsrc = btileptr[cols]
            w, r = _plan_runs_chunk(
                tsrc.astype(np.int64), tdst, tl, 1,
                c.rb * wt, wrows, _FILL_EPG)
            wins.append(w)
            runss.append(r)
            tds.append(tdst.astype(np.int32))
            s_total += w.shape[0]
            r_total += int(w[:, 1].sum())
            np.add.at(t_row_len[k], np.minimum(slot, c.rb - 1),
                      np.where(lv & (slot < c.rb), tl, 0).astype(
                          np.int32))
        slots = wt * c.rb * c.nchunks
        fill_est = (s_total * _FILL_STEP_US * 1e3
                    + r_total * _FILL_RUN_US * 1e3
                    + slots * _FILL_NS_PER_SLOT)
        gather_est = slots * _GATHER_NS_PER_SLOT
        if fill_est >= gather_est and not force:
            continue
        S = quantize(max(w.shape[0] for w in wins))
        epg = runss[0].shape[1]
        t_win = np.zeros((c.nchunks, S, 2), np.int32)
        t_runs = np.zeros((c.nchunks, S, epg, 3), np.int32)
        for k, (w, r) in enumerate(zip(wins, runss)):
            t_win[k, :w.shape[0]] = w
            t_runs[k, :r.shape[0]] = r
        e.update(t_fill=True, t_wrows=wrows,
                 t_out_rows=-(-(c.rb * wt) // 128),     # per plane
                 t_win=t_win, t_runs=t_runs,
                 t_ent_dst=np.stack(tds), t_row_len=t_row_len)
        any_fill = True
    tile_pairs = None
    if any_fill:
        wrows_max = max(e["t_wrows"] for e in extras)
        tile_pairs = build_pairs_planar(
            tilecol_h, tilemask_h.view(np.float32), 1, wrows_max)
    return tiles_per_row, extras, tile_pairs


def masked_upload(plan: BucketPlan, extras: List[dict]) -> list:
    """Device descriptor arrays for the masked engine: the bucketed
    plan's uploaded per-class arrays (shared, not duplicated) plus, for
    tile-fill classes, the tile-slab descriptors from the extras."""
    from .bucketed import upload_plan
    upload_plan(plan)
    out = []
    for base, e in zip(plan.dev, extras):
        if e["t_fill"]:
            base = tuple(base) + tuple(
                jnp.asarray(e[k]) for k in ("t_ent_dst", "t_row_len",
                                            "t_win", "t_runs"))
        out.append(tuple(base))
    return out


def _entry_tile_seeds(ent_dst, ent_len, ent_aidx, a_col, btileptr,
                      tiles_per_row, *, W: int, rb: int, Wt: int):
    """Derive the tile-slab entry descriptors on device: src/len from the
    mask matrix via entry-granularity gathers, dst from a within-row
    exclusive cumsum over the (row-ordered) entry list."""
    cols = a_col[ent_aidx]
    tsrc = btileptr[cols]
    tlen = jnp.where(ent_len > 0, tiles_per_row[cols], 0)
    row = ent_dst // jnp.int32(W)             # slab row of each entry
    # exclusive cumsum of tlen within equal-row segments (entries are
    # row-ordered; pad entries have ent_dst = rb*W -> row = rb, own seg)
    cs = jnp.cumsum(tlen)
    first = jnp.concatenate([jnp.ones((1,), bool), row[1:] != row[:-1]])
    base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, cs - tlen, -1))
    toff = cs - tlen - base
    tdst = row * jnp.int32(Wt) + toff
    tdst = jnp.where((ent_len > 0) & (row < rb), tdst,
                     jnp.int32(rb * Wt))      # pad -> dropped
    return tsrc.astype(jnp.int32), tlen.astype(jnp.int32), \
        tdst.astype(jnp.int32), toff.astype(jnp.int32)


def _tile_front_gather(ent_dst, ent_len, ent_aidx, a_col, btileptr,
                       tiles_per_row, tilecol, tilemask, *, W: int,
                       rb: int, Wt: int, t_hold: int):
    """Tile-slab expansion via XLA gathers: derive the per-entry tile
    descriptors on device, hold-scan them over the slab, gather the
    (tilecol, tilemask) pairs per slot.  Returns (tc, tm, tdst)."""
    tsrc, tlen, tdst, _ = _entry_tile_seeds(
        ent_dst, ent_len, ent_aidx, a_col, btileptr, tiles_per_row,
        W=W, rb=rb, Wt=Wt)
    RT = rb * Wt

    def tseed(vals, dtype):
        return jnp.zeros((RT,), dtype).at[tdst].set(
            vals, mode="drop").reshape(rb, Wt)

    t_s = tseed(tsrc, jnp.int32)
    t_l = tseed(tlen, jnp.int32)
    t_p = tseed(tdst, jnp.int32)
    t_starts = jnp.zeros((RT,), bool).at[tdst].set(
        True, mode="drop").reshape(rb, Wt)
    src0, len0, pos0 = _hold_scan_rows((t_s, t_l, t_p), t_starts, t_hold)
    tpos = jnp.arange(RT, dtype=jnp.int32).reshape(rb, Wt)
    toffs = tpos - pos0
    tvalid = (toffs >= 0) & (toffs < len0)
    tread = jnp.where(tvalid, src0 + toffs, 0).reshape(-1)
    tc = jnp.where(tvalid, tilecol[tread].reshape(rb, Wt), _I32_MAX)
    tm = jnp.where(tvalid, tilemask[tread].reshape(rb, Wt).astype(
        jnp.uint32), jnp.uint32(0))
    return tc, tm, tdst


def _tile_front_fill(t_ent_dst, t_row_len, t_win, t_runs, tile_pairs, *,
                     rb: int, Wt: int, t_wrows: int, t_out_rows: int,
                     interpret: bool):
    """Tile-slab expansion via the Mosaic ragged fill: the
    (tilecol, tilemask) spans stream in as contiguous PLANAR runs at
    DMA bandwidth, exactly like the product slab (descriptors host-
    planned in plan_masked_extras; ``t_out_rows`` is per plane).
    Returns (tc, tm, tdst)."""
    slab2 = rf.ragged_fill(t_win, t_runs, tile_pairs,
                           out_rows=_TILE_STRIDE * t_out_rows,
                           wrows=t_wrows, nplanes=_TILE_STRIDE,
                           src_stride_rows=tile_pairs.shape[0]
                           // _TILE_STRIDE,
                           dst_stride=t_out_rows * 128,
                           interpret=interpret)
    flat = slab2.reshape(-1)

    def plane(p):
        return jax.lax.slice_in_dim(
            flat, p * t_out_rows * 128,
            p * t_out_rows * 128 + rb * Wt).reshape(rb, Wt)

    tvalid = (jax.lax.broadcasted_iota(jnp.int32, (rb, Wt), 1)
              < t_row_len[:, None])
    tc = jnp.where(tvalid, plane(0), _I32_MAX)
    tm = jnp.where(tvalid, plane(1).astype(jnp.uint32), jnp.uint32(0))
    return tc, tm, t_ent_dst


def _chunk_masked(front, tfront, *, W: int, rb: int,
                  hold_passes: int, seg_passes: int, Wt: int,
                  t_hold: int, df: bool = False, tail: str = "off"):
    """One [rb, W] chunk of the masked engine (see module docstring).
    ``front()`` supplies the product slab (K, bv, valid, AV) — either
    the XLA-gather or the Mosaic ragged-fill expansion frontend;
    ``tfront()`` supplies the tile slab (tc, tm, tdst) the same way.
    ``df``: the double-f32 value pipeline (values travel and accumulate
    as Dekker (hi, lo) f32 pairs; oV comes back stacked [2, rb, W]) —
    the same convention as the bucketed engine, so extraction is
    shared.

    SYMBOLIC is the engine's identity: exact nnz per C row from the
    tile slab by sort + segmented OR + popcount (the reference's hash +
    atomicOr + __popc block reduction, inc/Calculate_C_nnz.cuh:410-835)
    — ``crow_nnz`` below, and C.ptr, come from THIS stage, before any
    numeric work.  NUMERIC shares the bucketed tail: sort by column,
    compensated segment sum, left-pack.  An earlier rebuild derived
    every product's destination as the closed-form popcount rank
    ``base(tile) + popc(mask & (bit-1))`` (inc/numeric.cuh:215-258 with
    the hash probe replaced by rank arithmetic); measured on hardware
    the per-slot gather of (rank base, OR mask) from the tile slab cost
    ~2x13 ns/slot — more than the whole sort-based tail it was feeding,
    whose final left-pack produces the identical dense ranks (rank is
    monotone in column within a row).  The rank arithmetic survives in
    the symbolic popcount sums; the numeric destination comes from the
    shared tail's sort."""
    # ---- symbolic: sort tiles, OR runs, popcount -----------------------
    tc, tm, _ = tfront()
    sc, sm = jax.lax.sort((tc, tm.astype(jnp.int32)), num_keys=1,
                          dimension=1)
    new = jnp.concatenate(
        [jnp.ones((rb, 1), bool), sc[:, 1:] != sc[:, :-1]], axis=1)
    orm = _seg_or_rows(sm.astype(jnp.uint32), new, t_hold)
    ends = (jnp.concatenate([new[:, 1:], jnp.ones((rb, 1), bool)],
                            axis=1) & (sc < _I32_MAX))
    pc = jax.lax.population_count(orm).astype(jnp.int32)
    crow_nnz = jnp.sum(jnp.where(ends, pc, 0), axis=1, dtype=jnp.int32)

    # ---- numeric: shared expansion frontend + shared tail --------------
    K, bv, valid, AV = front()
    prod = _product(AV, bv, valid, df)
    oC, oV, _ = _chunk_tail(K, prod, rb=rb, seg_passes=seg_passes,
                            df=df, W=W, tail=tail)
    return oC, oV, crow_nnz


def _seg_or_rows(values: jax.Array, new: jax.Array, passes: int
                 ) -> jax.Array:
    """Segmented inclusive OR along rows (uint32 masks) — the
    ``atomicOr`` accumulation analogue."""
    v, f = values, new
    dist = 1
    for _ in range(passes):
        sv = jnp.concatenate(
            [jnp.zeros_like(v[:, :dist]), v[:, :-dist]], axis=1)
        sf = jnp.concatenate(
            [jnp.ones((v.shape[0], dist), bool), f[:, :-dist]], axis=1)
        v = jnp.where(f, v, v | sv)
        f = f | sf
        dist *= 2
    return v


@functools.partial(jax.jit, static_argnames=("specs", "m", "vdtype",
                                             "interpret", "df"))
def masked_main(class_arrays, a_val, b_col, b_val, pairs2d, a_col,
                btileptr, tiles_per_row, tilecol, tilemask, tile_pairs,
                *, specs: Tuple[Tuple[int, ...], ...], m: int,
                vdtype=None, interpret: bool = False,
                df: bool = False):
    """Whole-matrix masked main program (mirrors bucketed_main; same
    output contract, so finish_bucketed / the extraction programs are
    shared).  Classes whose plan carries a Mosaic fill use the
    ragged-fill frontend for the PRODUCT slab, classes whose extras
    carry one use it for the TILE slab too; others the XLA gathers."""
    crow = jnp.zeros((m + 1,), jnp.int32)
    slabs = []
    totals = []
    for (W, rb, nchunks, eb, hp, sp, fill, stride, wrows, out_rows,
         planar, _grp, _pre, _pf, _pfs, Wt, th, tfill, t_wrows,
         t_out_rows), arrs in zip(specs, class_arrays):
        rows_g = arrs[0]
        ntile = 4 if tfill else 0
        base, tarrs = (arrs[:-ntile], arrs[-ntile:]) if ntile else \
            (arrs, ())

        def body(*xs, _W=W, _rb=rb, _hp=hp, _sp=sp, _Wt=Wt, _th=th,
                 _fill=fill, _tfill=tfill, _stride=stride, _wrows=wrows,
                 _out_rows=out_rows, _planar=planar, _t_wrows=t_wrows,
                 _t_out_rows=t_out_rows, _nbase=len(base)):
            bx, tx = xs[:_nbase], xs[_nbase:]
            if _fill:
                rows_g, ent_dst, ent_len, ent_aidx, row_len, win_row, \
                    runs = bx
                front = functools.partial(
                    _front_fill, ent_dst, ent_aidx, row_len, win_row,
                    runs, a_val, pairs2d, W=_W, rb=_rb, hold_passes=_hp,
                    stride=_stride, wrows=_wrows, out_rows=_out_rows,
                    vdtype=vdtype or b_val.dtype, interpret=interpret,
                    planar=_planar, df=df)
            else:
                rows_g, ent_dst, ent_src, ent_len, ent_aidx = bx
                front = functools.partial(
                    _front_gather, ent_dst, ent_src, ent_len, ent_aidx,
                    a_val, b_col, b_val, W=_W, rb=_rb, hold_passes=_hp,
                    df=df)
            if _tfill:
                t_ent_dst, t_row_len, t_win, t_runs = tx
                tfront = functools.partial(
                    _tile_front_fill, t_ent_dst, t_row_len, t_win,
                    t_runs, tile_pairs, rb=_rb, Wt=_Wt,
                    t_wrows=_t_wrows, t_out_rows=_t_out_rows,
                    interpret=interpret)
            else:
                tfront = functools.partial(
                    _tile_front_gather, ent_dst, ent_len, ent_aidx,
                    a_col, btileptr, tiles_per_row, tilecol, tilemask,
                    W=_W, rb=_rb, Wt=_Wt, t_hold=_th)
            return _chunk_masked(front, tfront, W=_W, rb=_rb,
                                 hold_passes=_hp, seg_passes=_sp,
                                 Wt=_Wt, t_hold=_th, df=df)

        allarrs = tuple(base) + tuple(tarrs)
        if nchunks == 1:
            oC, oV, nnz_row = body(*(x[0] for x in allarrs))
            oC, oV, nnz_row = oC[None], oV[None], nnz_row[None]
        else:
            def step(carry, xs):
                return carry, body(*xs)
            _, (oC, oV, nnz_row) = jax.lax.scan(step, None, allarrs)
        idx = jnp.where(rows_g >= 0, rows_g, m)
        crow = crow.at[idx.reshape(-1)].set(nnz_row.reshape(-1),
                                            mode="drop")
        slabs.append((oC, oV, nnz_row))
        totals.append(jnp.sum(nnz_row.astype(jnp.int64)))
    crow = crow[:m]
    cptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(crow)])
    return crow, cptr, jnp.stack(totals) if totals else jnp.zeros(
        (0,), jnp.int64), slabs


@functools.partial(jax.jit, static_argnames=("specs", "m", "vdtype",
                                             "interpret", "nnz_cap",
                                             "ext_spec", "df"))
def masked_fused(class_arrays, a_val, b_col, b_val, pairs2d, a_col,
                 btileptr, tiles_per_row, tilecol, tilemask, tile_pairs,
                 slab_row_start, ext_win, ext_runs, *,
                 specs: Tuple[Tuple[int, ...], ...], m: int,
                 vdtype=None, interpret: bool = False,
                 nnz_cap: int = 1, ext_spec=None, df: bool = False):
    """Warm-path masked program: main + extraction in ONE dispatch (the
    masked twin of bucketed_fused; see that docstring for why — one
    ~31 ms transport round trip per iteration on this environment)."""
    crow, cptr, totals, slabs = masked_main(
        class_arrays, a_val, b_col, b_val, pairs2d, a_col, btileptr,
        tiles_per_row, tilecol, tilemask, tile_pairs, specs=specs, m=m,
        vdtype=vdtype, interpret=interpret, df=df)
    if ext_spec is not None:
        ccol, cval = bucketed_extract_mosaic(
            slabs, ext_win, ext_runs, slab_row_start, cptr,
            spec=ext_spec, m=m, nnz_cap=nnz_cap, interpret=interpret,
            df=df)
    else:
        ccol, cval = bucketed_extract(slabs, slab_row_start, cptr,
                                      m=m, nnz_cap=nnz_cap, df=df)
    return cptr, ccol, cval
