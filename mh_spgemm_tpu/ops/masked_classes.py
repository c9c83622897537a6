"""Masked (MH-faithful) engine on the bucketed class machinery.

Round-1's masked engine ran the tile-mask pipeline at FLAT granularity:
one product-length sort plus a product-granularity scatter-add, capped by
``masked_max_products``.  This rebuild keeps the reference's semantic
identity — a compressed 32-column tile bitmap of B, an exact symbolic
stage that ORs tile masks and popcounts (``inc/Calculate_C_nnz.cuh:
410-835``), and a numeric whose destination of every product is the
closed-form popcount rank ``base(tile) + popc(mask & (bit-1))``
(``inc/numeric.cuh:215-258`` with the hash probe replaced by rank
arithmetic) — but executes BOTH stages inside the bucketed engine's
fixed-width row classes:

* per chunk, a TILE slab [rb, Wt] is expanded from the mask matrix
  (2 entry-run gathers), sorted by tile column, OR-accumulated over
  equal-tile runs (segmented OR = the ``atomicOr`` analogue), and
  popcounted — exact nnz per row, rank bases per distinct tile;
* the PRODUCT slab [rb, W] reuses the bucketed expansion; each slot
  derives its tile position locally (count of tile-column changes
  within its entry segment — no extra per-product stream), gathers its
  tile's (rank base, OR mask) from the tile slab, and computes its
  exact destination rank;
* accumulation is a batched in-row sort by destination (measured
  ~0.2-0.3 ns/slot) + segmented sum — the TPU replacement for
  ``atomicAdd`` — and the ranks being dense 0..nnz-1 makes the packed
  output come out in final column order directly.

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
from .bucketed import (BucketPlan, _front_fill, _front_gather,
                       _hold_scan_rows, _log2_bound, _seg_sum_rows,
                       _I32_MAX, bucketed_extract,
                       bucketed_extract_mosaic)
from .shapes import quantize

_TILE_LOW = (1 << TILE_BITS) - 1


def plan_masked_extras(plan: BucketPlan, a_ptr: np.ndarray,
                       a_col: np.ndarray, b_ptr: np.ndarray,
                       b_col: np.ndarray) -> Tuple[np.ndarray, List[dict]]:
    """Host-side additions for the masked engine: B's per-row tile counts
    and, per class, the static TILE slab width Wt (quantized max per-row
    tile total over the class rows).  Everything else (tile descriptor
    arrays) is derived on device from the existing entry descriptors."""
    btile = (b_col >> TILE_BITS).astype(np.int64)
    rows_of = np.repeat(np.arange(b_ptr.shape[0] - 1),
                        np.diff(b_ptr))
    starts = np.ones(b_col.shape[0], bool)
    starts[1:] = (rows_of[1:] != rows_of[:-1]) | (btile[1:] != btile[:-1])
    tiles_per_row = np.bincount(rows_of[starts],
                                minlength=b_ptr.shape[0] - 1)
    # per C row: total tiles streamed = sum over entries (fub_row)
    tcs = np.concatenate([[0], np.cumsum(tiles_per_row[a_col])])
    t_row = tcs[a_ptr[1:]] - tcs[a_ptr[:-1]]
    extras = []
    for c in plan.classes:
        rows = c.rows_g.reshape(-1)
        live = rows[rows >= 0]
        wt = int(t_row[live].max()) if live.size else 1
        wt = max(8, quantize(wt))
        extras.append({"Wt": wt, "t_hold": _log2_bound(wt)})
    return tiles_per_row.astype(np.int32), extras


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


def _chunk_masked(front, rows_g, ent_dst, ent_len, ent_aidx,
                  a_val, a_col, btileptr, tiles_per_row,
                  tilecol, tilemask, *, W: int, rb: int,
                  hold_passes: int, seg_passes: int, Wt: int,
                  t_hold: int):
    """One [rb, W] chunk of the masked engine (see module docstring).
    ``front()`` supplies the product slab (K, bv, valid, AV) — either
    the XLA-gather or the Mosaic ragged-fill expansion frontend."""
    # ---- tile slab: expand the mask matrix per entry -------------------
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

    # ---- symbolic: sort tiles, OR runs, popcount ranks -----------------
    # (the reference's hash + atomicOr + __popc block reduction,
    # inc/Calculate_C_nnz.cuh:410-835, as sort + segmented OR)
    order = jnp.arange(RT, dtype=jnp.int32).reshape(rb, Wt)
    sc, sm, spos = jax.lax.sort(
        (tc, tm.astype(jnp.int32), order), num_keys=1, dimension=1)
    new = jnp.concatenate(
        [jnp.ones((rb, 1), bool), sc[:, 1:] != sc[:, :-1]], axis=1)
    orm = _seg_or_rows(sm.astype(jnp.uint32), new, t_hold)
    ends = (jnp.concatenate([new[:, 1:], jnp.ones((rb, 1), bool)],
                            axis=1) & (sc < _I32_MAX))
    pc = jax.lax.population_count(orm).astype(jnp.int32)
    pc_end = jnp.where(ends, pc, 0)
    crow_nnz = jnp.sum(pc_end, axis=1, dtype=jnp.int32)
    # rank base of each run = exclusive cumsum of end-popcounts per row
    base_end = jnp.cumsum(pc_end, axis=1) - pc_end
    # broadcast each run's END attributes (base, full OR mask) BACK over
    # the run, then unsort to tile-slab order: a backward hold — reverse,
    # forward-hold on run boundaries, reverse again
    run_base = _hold_back(base_end, ends, t_hold)
    run_mask = _hold_back(orm.astype(jnp.int32), ends, t_hold)
    # unsort via one more batched sort by original position
    _, u_base, u_mask = jax.lax.sort(
        (spos, run_base, run_mask), num_keys=1, dimension=1)
    flat_base = u_base.reshape(-1)
    flat_mask = u_mask.reshape(-1).astype(jnp.uint32)

    # ---- numeric: shared expansion frontend + closed-form rank dst -----
    K, bv, valid, AV = front()
    prod = jnp.where(valid, AV * bv, jnp.zeros((), bv.dtype))

    # per-slot tile position: entry's tile-slab base (hold-scanned) plus
    # the count of tile-column changes inside the entry segment
    p_starts = jnp.zeros((rb * W,), bool).at[ent_dst].set(
        True, mode="drop").reshape(rb, W)
    (tbase0,) = _hold_scan_rows(
        (jnp.zeros((rb * W,), jnp.int32).at[ent_dst].set(
            tdst, mode="drop").reshape(rb, W),),
        p_starts, hold_passes)
    ktile = K >> TILE_BITS
    prev = jnp.concatenate([jnp.full((rb, 1), -1, jnp.int32),
                            ktile[:, :-1]], axis=1)
    tstart = (p_starts | (ktile != prev)) & valid
    tidx = _seg_sum_rows(tstart.astype(jnp.int32), p_starts,
                         hold_passes) - 1
    tslab = jnp.clip(tbase0 + tidx, 0, rb * Wt - 1).reshape(-1)
    dbase = flat_base[tslab].reshape(rb, W)              # rank base
    dmask = flat_mask[tslab].reshape(rb, W)              # OR'd tile mask
    bit = (K & jnp.int32(_TILE_LOW)).astype(jnp.uint32)
    below = (jnp.uint32(1) << bit) - jnp.uint32(1)
    rank = jax.lax.population_count(dmask & below).astype(jnp.int32)
    dst = jnp.where(valid, dbase + rank, _I32_MAX)

    # ---- accumulate: sort by dense destination rank + segment sum ------
    sd, sK2, sV = jax.lax.sort((dst, K, prod), num_keys=1, dimension=1)
    newd = jnp.concatenate(
        [jnp.ones((rb, 1), bool), sd[:, 1:] != sd[:, :-1]], axis=1)
    vsum = _seg_sum_rows(sV, newd, seg_passes)
    dends = (jnp.concatenate([newd[:, 1:], jnp.ones((rb, 1), bool)],
                             axis=1) & (sd < _I32_MAX))
    # ranks are dense 0..crow-1: the end slots, re-sorted by rank, are
    # already the final packed row (columns ascending)
    key2 = jnp.where(dends, sd, _I32_MAX)
    _, oC, oV = jax.lax.sort((key2, sK2, vsum), num_keys=1, dimension=1)
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


def _hold_back(values: jax.Array, ends: jax.Array, passes: int
               ) -> jax.Array:
    """Broadcast the value at each segment END backward over its
    segment (reverse + forward hold + reverse)."""
    rv = values[:, ::-1]
    rs = ends[:, ::-1]
    (out,) = _hold_scan_rows((rv,), rs, passes)
    return out[:, ::-1]


@functools.partial(jax.jit, static_argnames=("specs", "m", "vdtype",
                                             "interpret"))
def masked_main(class_arrays, a_val, b_col, b_val, pairs2d, a_col,
                btileptr, tiles_per_row, tilecol, tilemask, *,
                specs: Tuple[Tuple[int, ...], ...], m: int,
                vdtype=None, interpret: bool = False):
    """Whole-matrix masked main program (mirrors bucketed_main; same
    output contract, so finish_bucketed / the extraction programs are
    shared).  Classes whose plan carries a Mosaic fill use the
    ragged-fill product-slab frontend; others the XLA gathers."""
    crow = jnp.zeros((m + 1,), jnp.int32)
    slabs = []
    totals = []
    for (W, rb, nchunks, eb, hp, sp, fill, stride, wrows, out_rows,
         Wt, th), arrs in zip(specs, class_arrays):
        rows_g = arrs[0]
        if fill:
            def body(rows_g, ent_dst, ent_len, ent_aidx, row_len,
                     win_row, runs, _W=W, _rb=rb, _hp=hp, _sp=sp,
                     _Wt=Wt, _th=th, _stride=stride, _wrows=wrows,
                     _out_rows=out_rows):
                front = functools.partial(
                    _front_fill, ent_dst, ent_aidx, row_len, win_row,
                    runs, a_val, pairs2d, W=_W, rb=_rb, hold_passes=_hp,
                    stride=_stride, wrows=_wrows, out_rows=_out_rows,
                    vdtype=vdtype or b_val.dtype, interpret=interpret)
                return _chunk_masked(
                    front, rows_g, ent_dst, ent_len, ent_aidx, a_val,
                    a_col, btileptr, tiles_per_row, tilecol, tilemask,
                    W=_W, rb=_rb, hold_passes=_hp, seg_passes=_sp,
                    Wt=_Wt, t_hold=_th)
        else:
            def body(rows_g, ent_dst, ent_src, ent_len, ent_aidx,
                     _W=W, _rb=rb, _hp=hp, _sp=sp, _Wt=Wt, _th=th):
                front = functools.partial(
                    _front_gather, ent_dst, ent_src, ent_len, ent_aidx,
                    a_val, b_col, b_val, W=_W, rb=_rb, hold_passes=_hp)
                return _chunk_masked(
                    front, rows_g, ent_dst, ent_len, ent_aidx, a_val,
                    a_col, btileptr, tiles_per_row, tilecol, tilemask,
                    W=_W, rb=_rb, hold_passes=_hp, seg_passes=_sp,
                    Wt=_Wt, t_hold=_th)
        if nchunks == 1:
            oC, oV, nnz_row = body(*(x[0] for x in arrs))
            oC, oV, nnz_row = oC[None], oV[None], nnz_row[None]
        else:
            def step(carry, xs):
                return carry, body(*xs)
            _, (oC, oV, nnz_row) = jax.lax.scan(step, None, arrs)
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
                                             "ext_spec"))
def masked_fused(class_arrays, a_val, b_col, b_val, pairs2d, a_col,
                 btileptr, tiles_per_row, tilecol, tilemask,
                 slab_row_start, ext_win, ext_runs, *,
                 specs: Tuple[Tuple[int, ...], ...], m: int,
                 vdtype=None, interpret: bool = False,
                 nnz_cap: int = 1, ext_spec=None):
    """Warm-path masked program: main + extraction in ONE dispatch (the
    masked twin of bucketed_fused; see that docstring for why — one
    ~31 ms transport round trip per iteration on this environment)."""
    crow, cptr, totals, slabs = masked_main(
        class_arrays, a_val, b_col, b_val, pairs2d, a_col, btileptr,
        tiles_per_row, tilecol, tilemask, specs=specs, m=m,
        vdtype=vdtype, interpret=interpret)
    if ext_spec is not None:
        ccol, cval = bucketed_extract_mosaic(
            slabs, ext_win, ext_runs, slab_row_start, cptr,
            spec=ext_spec, m=m, nnz_cap=nnz_cap, interpret=interpret)
    else:
        ccol, cval = bucketed_extract(slabs, slab_row_start, cptr,
                                      m=m, nnz_cap=nnz_cap)
    return cptr, ccol, cval
