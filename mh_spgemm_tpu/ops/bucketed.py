"""Bucketed expand-sort-compress SpGEMM — the TPU performance engine.

This is the TPU-native re-architecture of the reference's central design
idea: *bin rows by work estimate, run a specialised fixed-capacity kernel
per bin* (``inc/binning.cuh:1-155``, the 13-bin kernel zoo of
``inc/Calculate_C_nnz.cuh`` / ``inc/numeric.cuh``).  Measured XLA:TPU
primitive costs dictate the mapping:

* per-element random access (gather/scatter/``jnp.repeat``) costs ~10-25 ns
  per element — the analogue of an uncoalesced global-memory access;
* batched per-row sorts run ~10x faster than flat sorts of the same element
  count (rows sort inside VMEM);
* dense vector passes (cumsum/cummax/where) are bandwidth-bound and nearly
  free.

So instead of shared-memory hash tables per bin, each row class gets a
fixed *width* W (the hash-table-capacity analogue): rows whose
intermediate-product count fits in W are packed into ``[rows_per_chunk, W]``
matrices, the product stream is materialised with exactly TWO per-element
gathers (B column + B value — the irreducible data movement), everything
else (segment expansion, A-value broadcast, duplicate-column accumulation,
compaction) is scans and batched sorts.  The reference's per-bin CUDA
streams become one jitted program whose per-class ``lax.scan`` chunks XLA
pipelines back-to-back; its ``atomicAdd`` hash accumulation becomes a
segmented scan over sorted runs.

Pipeline (per class, per chunk):

1. seed per-A-entry descriptors (src base, len, dst, a-value) at their
   destination slots — entry-count-sized scatters — then ONE shared
   row-local hold-scan broadcasts them down their segments: every slot
   learns its source B position and A value in log2(W) vector passes
   (replacing ``jnp.repeat``, searchsorted, and per-element descriptor
   lookups);
2. gather B columns / values once each (the only per-element gathers);
3. one batched in-row sort by column; segmented sum over equal-column runs
   (the hash-accumulate analogue, ``inc/numeric.cuh:215-258``);
4. a second batched in-row sort left-packs the surviving (column, value)
   pairs — the table-compaction analogue (``inc/numeric.cuh:264-297``);
   columns come out ascending per row, so no count/bitonic sort is needed.

A final extraction program turns the left-packed class slabs into one CSR
gather-ONLY: slab source addresses come from a delta-cumsum (no row
lookup), the output is written contiguously, and only one i32 + one value
gather remain per output nonzero.

All shapes are static and quantized; in steady state (sizes cached in the
plan) a full SpGEMM is TWO async dispatches and ONE host sync.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import esc_tail as esc_tail_mod
from . import ragged_fill as rf
from .esc_tail import df_add_xla, df_mul_xla, dekker_split_np
from .shapes import quantize

_I32_MAX = np.int32(2**31 - 1)

# Measured v5e constants driving the per-class fill-vs-gather choice:
# the XLA takes-path expansion costs ~3.3-5 ns/slot (re-measured
# 2026-08-20 with full-output consumption, scripts/micro_gather2.py —
# the earlier 26-27 ns figure came from a slower XLA gather lowering);
# the Mosaic fill costs ~1.7 us per grid step, ~0.4 us per run (scalar
# setup + block walk), and ~2 ns/slot of vector work.  The planner
# compares the two estimates per class.  Env-overridable for A/B runs.
# Re-measured 2026-08-20 with ORDER-SENSITIVE consumption: XLA gathers
# cost ~8 ns per INDEX on v5e (scripts/micro_gather3.py) and the takes
# frontend pays 3-5 of them per slot -> ~25-40 ns/slot end to end.  The
# round-4 "5 ns" figure came from a DCE-polluted micro and made the
# fill cost model reject the DMA expansion on every long-span member
# (offshore 1.4 -> 4.2 s in the round-5 record).
_GATHER_NS_PER_SLOT = float(os.environ.get("MHSPGEMM_GATHER_NS", "30.0"))
# End-to-end per-slot cost for the CLASS-MERGE decision: a padded slot
# pays the whole pipeline (frontend + df two-product + segmented sums +
# two sorts ≈ 25-40 ns measured, scripts/profile_bucketed.py round 5),
# not just the frontend gather.  Round-5's first cut merged at the
# 5 ns frontend figure and ballooned scircuit's area 634K -> 2.1M slots
# for a net loss.
_MERGE_SLOT_NS = float(os.environ.get("MHSPGEMM_MERGE_SLOT_NS", "30.0"))
# Grouped slice-gather (scripts/micro_group_gather.py): the short-span
# specialization candidate — G-align entry spans so one G*k-word slice
# gather feeds G slots (the reference's tiny-row/pwarp bins,
# inc/binning.cuh:1-65, inc/numeric.cuh:66-214, rebuilt as slot-packing
# geometry).  MEASURED on this chip (2026-08-20): XLA's gather is fast
# ONLY for slices <= 4 words (~3-4 ns/idx) and falls off a cliff at
# >= 8 words (~213 ns/idx, a serial lowering), so grouping never wins
# here and the cost model below keeps G=1 throughout.  The machinery
# stays: a backend whose wide slices are cheap flips these constants.
_GROUP_IDX_NS = {1: 4.0, 2: 213.0, 4: 141.0, 8: 138.0}
_GROUP_TAIL_NS = 3.0
_GROUP_CANDS = (1, 2, 4, 8)
_WORDS_PAD = max(_GROUP_CANDS)   # over-read slack products in build_words
_FILL_STEP_US = 1.7
_FILL_RUN_US = 0.4
_FILL_NS_PER_SLOT = 2.0
_FILL_MIN_SPAN_WORDS = 16      # don't even attempt fill below this
_FILL_WORDS_CAP = 3 << 18      # chunk slab3 words (VMEM-resident, ~3 MB)
_FILL_EPG = 256                # runs per grid step (descriptor block)
# The pairs stream is prepended with this many zero words and every
# window starts one row early with src_rel biased by +128: together they
# guarantee the kernel's window-row index (d0 + or_) is never negative —
# pl.ds would otherwise clamp a negative start and shift the whole
# [8, 128] block read (bias >= max window stride SW = 64*128).
_FILL_BIAS_WORDS = 8192


# ---------------------------------------------------------------------------
# Host-side planning (the binning pass — reference k_binning1/k_binning2,
# inc/binning.cuh:67-155, done once per (A, B) and cached in the plan)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ClassPlan:
    """One row class: all rows whose product count fits in width W."""

    W: int                 # row capacity (the hash-table-size analogue)
    rb: int                # rows per chunk (W * rb <= area cap)
    nchunks: int
    eb: int                # A-entry capacity per chunk (quantized)
    rows_g: np.ndarray     # int32[nchunks, rb]   global row ids, -1 pad
    ent_dst: np.ndarray    # int32[nchunks, eb]   slot*W + in-row offset
    ent_src: np.ndarray    # int32[nchunks, eb]   b_ptr[a_col[e]]
    ent_len: np.ndarray    # int32[nchunks, eb]   nnz of referenced B row
    ent_aidx: np.ndarray   # int32[nchunks, eb]   index into a_val
    hold_passes: int       # log2 bound on B-segment length within a row
    seg_passes: int        # log2 bound on same-column run length
    # Mosaic ragged-fill expansion (ops/ragged_fill.py) — populated when
    # the plan-time cost model picks the DMA path for this class:
    fill: bool = False
    stride: int = 0                       # i32 words per B nonzero
    wrows: int = 0                        # source window rows per step
    out_rows: int = 0                     # slab3 rows (interleaved: total
    #                                       without pad; planar: PER PLANE)
    planar: bool = False                  # planar transport: one plane per
    #                                       word, run geometry in elements
    #                                       (kills the stride-deinterleave)
    win_row: Optional[np.ndarray] = None  # int32[nchunks, S, 2]
    runs: Optional[np.ndarray] = None     # int32[nchunks, S, EPG, 3]
    row_len: Optional[np.ndarray] = None  # int32[nchunks, rb] products/row
    # Grouped slice-gather frontend (short-span specialization): every
    # entry's slab span is padded to a multiple of G, so ONE G*k-word
    # slice gather per aligned G-block feeds G slots (G=1 = plain wide
    # gather).  W % G == 0 by construction.
    G: int = 1
    # Precomputed per-slot expansion (single-chip gather classes): the
    # seed descriptors are plan-static, so the hold-scan's per-slot
    # result (B source index, A value index) is materialised ON HOST at
    # plan time and the device frontend collapses to pure takes —
    # measured 2026-08-20: the 5 seed scatters + 2*log2(W) hold passes
    # cost ~4 ns/slot that two extra plan-resident i32 reads replace.
    pre: bool = False
    slot_src: Optional[np.ndarray] = None   # int32[nchunks, rb*W], -1 pad
    slot_aidx: Optional[np.ndarray] = None  # int32[nchunks, rb*W]
    # planned frontend (ops/planned.py): host gather schedules + routing
    # masks; engaged when pf is True (see attach_planned)
    pf: bool = False
    pf_host: Optional[dict] = None          # stacked per-chunk arrays
    pf_spec: Tuple[int, ...] = ()           # (m_b, nst_b, m_a, nst_a)

    @property
    def spec(self) -> Tuple[int, ...]:
        return (self.W, self.rb, self.nchunks, self.eb,
                self.hold_passes, self.seg_passes,
                self.fill, self.stride, self.wrows, self.out_rows,
                self.planar, self.G, self.pre, self.pf, self.pf_spec)


@dataclasses.dataclass
class ExtractPlan:
    """Host plan for the Mosaic extraction: per OUTPUT chunk (a CSR slot
    range small enough for a VMEM-resident ragged_fill output), the
    per-row packed-slab spans as (src, dst, len) SLOT runs grouped into
    source windows.  One descriptor drives every transport plane
    (col/hi/lo share identical span geometry; the kernel replays each
    run per plane at fixed source/destination strides)."""

    nplanes: int                        # col + value word planes
    nchunks: int
    cap_slots: int                      # output slots per chunk
    wrows: int
    area_pad: int                       # per-plane stream words (128-mult)
    win_row: np.ndarray                 # int32[nchunks, S, 2]
    runs: np.ndarray                    # int32[nchunks, S, EPG, 3]
    dev: Optional[tuple] = None


@dataclasses.dataclass
class BucketPlan:
    """Host plan: row classes + device descriptor arrays + cached sizes."""

    m: int                              # true row count
    m_cap: int                          # quantized (jit-static) row count
    classes: List[ClassPlan]
    intprod: int
    slab_row_start: Optional[np.ndarray] = None  # int32[m] flat slab offset
    dev: Optional[list] = None          # uploaded descriptor arrays
    dev_slab_start: Optional[object] = None
    class_caps: Optional[Tuple[int, ...]] = None  # quantized nnz per class
    nnz_c: Optional[int] = None
    nnz_cap: Optional[int] = None
    dma_fill: str = "off"
    vwords: int = 2
    ext: Optional[ExtractPlan] = None   # Mosaic extraction (or None)
    crow_h: Optional[np.ndarray] = None  # learned per-row nnz(C) (host)
    # static extraction (warm): per-output slab source index + cptr,
    # evaluated on host from crow_h — nnz(C) is structural, so once
    # learned these are plan constants and the warm program skips the
    # crow scatter / cptr cumsum / _slab_src hold entirely
    ext_src_h: Optional[np.ndarray] = None   # int32[nnz_cap], clipped
    cptr_h: Optional[np.ndarray] = None      # int32[m_cap + 1]
    ext_static_dev: Optional[tuple] = None   # (src, cptr) device pair
    ext_pf: Optional[dict] = None            # planned extraction arrays
    ext_pf_spec: Tuple[int, ...] = ()        # (m_e, nst_e, nch, CH, it)
    ext_pf_dev: Optional[tuple] = None

    def stats(self) -> dict:
        """Occupancy/padding counters — the TPU analogue of the reference's
        hash-conflict counter (inc/Calculate_C_nnz.cuh:153-155): the
        bucketed engine has no probe conflicts by construction, its
        efficiency loss is slot padding, reported per class."""
        area = sum(c.W * c.rb * c.nchunks for c in self.classes)
        return {
            "engine": "bucketed",
            "intprod": self.intprod,
            "area_slots": area,
            "padding_ratio": round(area / max(1, self.intprod), 3),
            "nnz_c": self.nnz_c,
            "classes": [
                {"W": c.W, "chunks": c.nchunks, "rows_per_chunk": c.rb,
                 "rows": int((c.rows_g >= 0).sum()),
                 "entry_cap": c.eb, "hold_passes": c.hold_passes,
                 "seg_passes": c.seg_passes, "fill": c.fill, "G": c.G,
                 "frontend": ("fill" if c.fill
                              else f"grouped{c.G}" if c.G > 1
                              else "planned" if c.pf
                              else "pre" if c.pre
                              else "gather")}
                for c in self.classes
            ],
        }


def _log2_bound(x: int) -> int:
    return max(1, int(x - 1).bit_length()) if x > 1 else 0


def _width_class(p: np.ndarray, min_width: int) -> np.ndarray:
    """Row width class per product count: powers of two plus 1.5x
    intermediates (8, 12, 16, 24, 32, ...)."""
    if p.size == 0:
        return p.astype(np.int64)
    pow2 = 2 ** np.ceil(np.log2(p)).astype(np.int64)
    half = (3 * pow2) // 4                      # 1.5 * previous pow2
    return np.maximum(min_width, np.where(p <= half, half, pow2))


def _plan_runs_chunk(ent_src: np.ndarray, ent_dst: np.ndarray,
                     ent_len: np.ndarray, stride: int, pad_dst: int,
                     wrows: int, epg: int):
    """Plan the Mosaic fill for ONE chunk: merge entry spans into maximal
    contiguous runs, split to the window payload cap, sort by source and
    group into grid steps on a fixed half-window grid (window stride
    SW = wrows*128/2 with run cap SW, so any run assigned to grid cell k
    lies inside the window [k*SW, k*SW + wrows*128)).

    Returns (win_row int32[S, 2] = (window start row, live run count),
    runs int32[S, epg, 3]) with runs[...,0] = window-relative src,
    [...,1] = flat slab3 dst, [...,2] = len, all in int32 WORDS
    (b-element units scaled by ``stride``).
    """
    live = (ent_len > 0) & (ent_dst < pad_dst)
    es = ent_src[live].astype(np.int64) * stride
    ed = ent_dst[live].astype(np.int64) * stride
    el = ent_len[live].astype(np.int64) * stride
    if es.size == 0:
        return (np.zeros((1, 2), np.int32), np.zeros((1, epg, 3),
                                                     np.int32))
    # merge: entries are in dst order; a run extends while BOTH src and
    # dst advance contiguously (adjacent A columns hit adjacent B rows)
    new = np.ones(es.size, bool)
    new[1:] = (es[1:] != es[:-1] + el[:-1]) | (ed[1:] != ed[:-1] + el[:-1])
    starts = np.flatnonzero(new)
    rs, rd = es[starts], ed[starts]
    rl = np.add.reduceat(el, starts)
    return _group_runs(rs, rd, rl, wrows, epg)


def _group_runs(rs: np.ndarray, rd: np.ndarray, rl: np.ndarray,
                wrows: int, epg: int):
    """Split (src, dst, len) word runs to the window payload cap, sort by
    source, and group into grid steps on the fixed half-window grid.
    Shared by the expansion planner and the extraction planner."""
    SW = wrows * 128 // 2
    if rs.size == 0:
        return (np.zeros((1, 2), np.int32), np.zeros((1, epg, 3),
                                                     np.int32))
    # split runs longer than the window payload cap
    npieces = (-(-rl // SW)).astype(np.int64)
    if npieces.max(initial=1) > 1:
        idx = np.repeat(np.arange(rs.size), npieces)
        within = (np.arange(idx.size)
                  - np.repeat(np.cumsum(npieces) - npieces, npieces))
        off = within * SW
        rs, rd = rs[idx] + off, rd[idx] + off
        rl = np.minimum(rl[idx] - off, SW)
    o = np.argsort(rs, kind="stable")
    rs, rd, rl = rs[o], rd[o], rl[o]
    rs_b = rs + _FILL_BIAS_WORDS          # see _FILL_BIAS_WORDS
    wid = rs_b // SW
    neww = np.ones(rs.size, bool)
    neww[1:] = wid[1:] != wid[:-1]
    wstart = np.flatnonzero(neww)
    counts = np.diff(np.concatenate([wstart, [rs.size]]))
    within = np.arange(rs.size) - np.repeat(wstart, counts)
    newstep = neww | (within % epg == 0)
    sid = np.cumsum(newstep) - 1
    S = int(sid[-1]) + 1
    win_row = np.zeros((S, 2), np.int32)
    win_row[sid, 0] = (wid * (SW // 128) - 1).astype(np.int32)
    win_row[:, 1] = np.bincount(sid, minlength=S).astype(np.int32)
    runs = np.zeros((S * epg, 3), np.int32)
    flat = sid * epg + (within % epg)
    runs[flat, 0] = (rs_b - wid * SW + 128).astype(np.int32)
    runs[flat, 1] = rd.astype(np.int32)
    runs[flat, 2] = rl.astype(np.int32)
    return win_row, runs.reshape(S, epg, 3)


def _fill_wrows(W: int, stride: int) -> int:
    """Window rows for a class: at least 2x the widest possible span so
    the half-window grid always fits a run, capped at 128 (64 KB)."""
    need = max(16, 2 * ((W * stride + 127) // 128))
    return min(128, 1 << (need - 1).bit_length())


def _attach_fill_plan(c: "ClassPlan", stride: int,
                      force: bool = False,
                      planar: bool = False) -> None:
    """Build per-chunk run plans for a class and accept the Mosaic fill
    path if the measured-cost model says it beats the XLA gathers.

    ``planar``: the transport stream and slab are one PLANE per word
    ([cols..][hi..][lo..] instead of interleaved [col,hi,lo] triples) —
    run geometry is in elements and one descriptor drives every plane
    via the kernel's fixed source/destination strides.  This removes
    the strided deinterleave + bitcast after the fill (measured
    ~2.9 ns/slot of the ~7.4 ns/slot fill-class total, cant df)."""
    gstride = 1 if planar else stride
    wrows = _fill_wrows(c.W, gstride)
    epg = _FILL_EPG
    wins, runss, s_total, r_total = [], [], 0, 0
    for k in range(c.nchunks):
        w, r = _plan_runs_chunk(c.ent_src[k], c.ent_dst[k], c.ent_len[k],
                                gstride, c.rb * c.W, wrows, epg)
        wins.append(w)
        runss.append(r)
        s_total += w.shape[0]
        r_total += int(w[:, 1].sum())
    slots = c.W * c.rb * c.nchunks
    fill_est = (s_total * _FILL_STEP_US * 1e3
                + r_total * _FILL_RUN_US * 1e3
                + slots * _FILL_NS_PER_SLOT)
    gather_est = slots * _GATHER_NS_PER_SLOT
    if fill_est >= gather_est and not force:
        return
    S = quantize(max(w.shape[0] for w in wins))
    win_row = np.zeros((c.nchunks, S, 2), np.int32)
    runs = np.zeros((c.nchunks, S, epg, 3), np.int32)
    for k, (w, r) in enumerate(zip(wins, runss)):
        win_row[k, :w.shape[0]] = w
        runs[k, :r.shape[0]] = r
    # per-slot product count (tight packing: max over entries of
    # dst+len within the slot) — replaces the expensive 4-value
    # hold-scan validity on the device with a single comparison
    row_len = np.zeros((c.nchunks, c.rb), np.int32)
    for k in range(c.nchunks):
        live = c.ent_len[k] > 0
        dst = c.ent_dst[k][live].astype(np.int64)
        end = dst + c.ent_len[k][live]
        slot = dst // c.W
        np.maximum.at(row_len[k], slot, (end - slot * c.W).astype(
            np.int32))
    c.fill = True
    c.stride = stride
    c.planar = planar
    c.wrows = wrows
    c.out_rows = (-(-(c.rb * c.W) // 128) if planar
                  else -(-(c.rb * c.W * stride) // 128))
    c.win_row = win_row
    c.runs = runs
    c.row_len = row_len


def _attach_slot_arrays(c: "ClassPlan") -> None:
    """Materialise the per-slot expansion operands (B source index, A
    value index) from the entry descriptors — the host-side evaluation
    of what _expand_seeds computes on device every call.  Slots outside
    any entry's span keep -1 (the invalid sentinel)."""
    RW = c.rb * c.W
    ss = np.full((c.nchunks, RW), -1, np.int32)
    sa = np.zeros((c.nchunks, RW), np.int32)
    live = c.ent_len > 0
    ch, ei = np.nonzero(live)
    if ch.size:
        dst = c.ent_dst[ch, ei].astype(np.int64)
        src = c.ent_src[ch, ei].astype(np.int64)
        ln = c.ent_len[ch, ei].astype(np.int64)
        ai = c.ent_aidx[ch, ei]
        tot = int(ln.sum())
        rep = np.repeat(np.arange(dst.size), ln)
        within = (np.arange(tot, dtype=np.int64)
                  - np.repeat(np.cumsum(ln) - ln, ln))
        pos = ch[rep] * RW + dst[rep] + within
        ss.reshape(-1)[pos] = (src[rep] + within).astype(np.int32)
        sa.reshape(-1)[pos] = ai[rep]
    c.pre = True
    c.slot_src = ss
    c.slot_aidx = sa


# Planned-frontend limits: chunk slot count bounds the routing-network
# width (masks, VMEM, compile size); the table cap keeps the B planes
# VMEM-resident (3 i32 planes under df plus outputs and masks).
_PF_CHUNK_CAP = int(os.environ.get("MHSPGEMM_PF_CHUNK_CAP", 32768))
_PF_TABLE_CAP_WORDS = int(os.environ.get("MHSPGEMM_PF_TABLE_CAP",
                                         6_500_000))


pn_nstages_1024 = 55        # len(_stage_list(1024)): dummy a-route spec


def attach_planned(classes: List["ClassPlan"], nnz_b: int,
                   interp: bool = False) -> None:
    """Attach planned-frontend schedules (ops/planned.py) to eligible
    pre classes: host-scheduled windowed gathers + static routing masks
    replace the per-slot XLA takes (~8 ns/index on this chip).

    Eligibility: pre class, chunk slots <= _PF_CHUNK_CAP (bounds the
    routing-network width and its masks), and the B table small enough
    to sit in VMEM (3 i32 planes under df/f32)."""
    from . import planned as pn
    if nnz_b + 1300 > _PF_TABLE_CAP_WORDS:
        return
    for c in classes:
        if not c.pre or c.fill:
            continue
        L = c.rb * c.W
        if L > _PF_CHUNK_CAP or c.W > L:
            continue
        scheds = []
        for k in range(c.nchunks):
            src = c.slot_src[k]
            aidx = c.slot_aidx[k]
            valid = src >= 0
            pos = np.flatnonzero(valid)
            bsch = pn.plan_pgather(src[pos].astype(np.int64), 0)
            head = valid.copy()
            cont = np.zeros(L, bool)
            cont[1:] = (valid[1:] & valid[:-1]
                        & (aidx[1:] == aidx[:-1])
                        & (src[1:] == src[:-1] + 1))
            cont[np.arange(L) % c.W == 0] = False
            head &= ~cont
            hpos = np.flatnonzero(head)
            asch = pn.plan_pgather(aidx[hpos].astype(np.int64), 0)
            scheds.append((pos, bsch, hpos, asch))
        Gb = max(s[1][0].shape[0] for s in scheds)
        Ga = max(s[3][0].shape[0] for s in scheds)
        m_b = pn._pow2(max(Gb * 1024, L, 1024))
        m_a = pn._pow2(max(Ga * 1024, L, 1024))
        if m_b > 4 * _PF_CHUNK_CAP:
            continue
        # A-operand mode: routed windowed gather when its schedule stays
        # dense; otherwise one XLA k=2 slice gather per slot on the
        # interleaved a_words operand (sparse scrambled aidx pads the
        # schedule ~2-3x and the routing network with it — measured
        # worse than the 8.4 ns/slot slice gather)
        a_route = m_a <= max(2 * pn._pow2(L), 2048)
        if not a_route:
            m_a, nst_a = 1024, pn_nstages_1024
        host = {k: [] for k in ("bg_wblk", "bg_rowsel", "bg_lane",
                                "bt_masks", "ag_wblk", "ag_rowsel",
                                "ag_lane", "at_masks", "flags")}
        nst_b = 0
        nst_a = pn_nstages_1024 if not a_route else 0
        for (pos, bsch, hpos, asch) in scheds:
            def pad_route(sch, dst_pos, m):
                wb, rowsel, lane, pm = sch
                G = wb.shape[0]
                Gmax = m // 1024
                wb2 = np.zeros(Gmax, np.int32)
                wb2[:G] = wb
                rs2 = np.zeros((Gmax * 8, 128), np.int32)
                rs2[: G * 8] = rowsel
                ln2 = np.zeros((Gmax * 8, 128), np.int32)
                ln2[: G * 8] = lane
                pm2 = np.full(Gmax * 1024, -1, np.int64)
                pm2[: pm.size] = pm
                live = pm2 >= 0
                dest = np.full(m, -1, np.int64)
                dest[np.flatnonzero(live)] = dst_pos[pm2[live]]
                free = np.setdiff1d(np.arange(m, dtype=np.int64),
                                    dst_pos[pm2[live]])
                dest[dest < 0] = free
                masks, nst = pn.plan_route(dest, m)
                return wb2, rs2, ln2, masks, nst
            wb2, rs2, ln2, mb, nst_b = pad_route(bsch, pos, m_b)
            host["bg_wblk"].append(wb2)
            host["bg_rowsel"].append(rs2)
            host["bg_lane"].append(ln2)
            host["bt_masks"].append(mb)
            if a_route:
                awb2, ars2, aln2, ma, nst_a = pad_route(asch, hpos,
                                                        m_a)
                fl = np.zeros(m_a, np.int32)
                fl[hpos] = 1
            else:       # XLA a_words slice gather: dummy device arrays
                awb2 = np.zeros(1, np.int32)
                ars2 = np.zeros((8, 128), np.int32)
                aln2 = np.zeros((8, 128), np.int32)
                ma = np.zeros((1, 1024), np.int32)
                fl = np.zeros(1024, np.int32)
            host["ag_wblk"].append(awb2)
            host["ag_rowsel"].append(ars2)
            host["ag_lane"].append(aln2)
            host["at_masks"].append(ma)
            host["flags"].append(fl)
        c.pf = True
        c.pf_host = {k: np.stack(v) for k, v in host.items()}
        c.pf_spec = (m_b, nst_b, m_a, nst_a, interp, a_route)


def plan_buckets(a_ptr: np.ndarray, a_col: np.ndarray, b_ptr: np.ndarray,
                 min_width: int = 128, area_cap: int = 1 << 23,
                 vwords: int = 2, dma_fill: str = "off",
                 b_starts: Optional[np.ndarray] = None,
                 b_lens: Optional[np.ndarray] = None,
                 forced: Optional[dict] = None,
                 planar: bool = False,
                 pow2_fill_widths: bool = False,
                 group: str = "off",
                 precompute: bool = False,
                 planned: str = "off"
                 ) -> BucketPlan:
    """Bin rows by product count into power-of-two width classes and build
    per-chunk A-entry descriptors (vectorized numpy; cached per (A, B)).

    ``dma_fill`` enables the Mosaic ragged-fill expansion per class
    ("auto" = measured-cost model, "on"/"interpret" = force, "off");
    ``vwords`` is the value width in i32 words (2 = f64, 1 = f32) used
    for the interleaved [col, val words] transport stream.

    ``b_starts``/``b_lens`` override the address layout of the B data
    the descriptors point at (default: CSR, ``b_ptr[:-1]``/``diff``) —
    the distributed engines plan against gathered or halo-payload
    layouts whose row starts are not a prefix sum.  ``forced`` maps
    width -> (rb, nchunks, eb, fill) to pin class shapes (including
    widths with zero local rows) AND the expansion frontend choice, so
    every shard of a mesh compiles ONE program (plan_buckets_sharded
    builds it)."""
    m = a_ptr.shape[0] - 1
    csr_layout = b_starts is None and b_lens is None
    if b_lens is None:
        b_lens = np.diff(b_ptr).astype(np.int64)
    else:
        b_lens = b_lens.astype(np.int64)
    if b_starts is None:
        b_starts = b_ptr[:-1]
    p_ent = b_lens[a_col]                                   # per A-entry
    cs = np.concatenate([[0], np.cumsum(p_ent)])
    p_row = cs[a_ptr[1:]] - cs[a_ptr[:-1]]                  # per C row
    intprod = int(cs[-1])

    active = np.flatnonzero(p_row > 0).astype(np.int32)
    classes: List[ClassPlan] = []
    if active.size == 0 and not forced:
        m_cap = quantize(max(1, m))
        return BucketPlan(m=m, m_cap=m_cap, classes=classes,
                          intprod=intprod, dma_fill=dma_fill,
                          vwords=vwords,
                          slab_row_start=np.zeros(m_cap, np.int32))

    # width grid: powers of two plus 1.5x intermediates (8,12,16,24,32,...)
    # — halves worst-case slot padding (the dominant per-slot cost is the
    # two gathers, paid on padded slots too) at the cost of ~2x classes
    p = p_row[active]
    a_row_nnz = np.diff(a_ptr)
    # per-row count of entries referencing NONEMPTY B rows (descriptor
    # counts; used by the native builder's capacity sizing)
    vcs = np.concatenate([[0], np.cumsum(p_ent > 0)])
    row_vcnt = (vcs[a_ptr[1:]] - vcs[a_ptr[:-1]]).astype(np.int64)

    from ..utils import native as native_lib

    stride = 1 + vwords
    fill_force = dma_fill in ("on", "interpret")
    fill_ok = (dma_fill in ("auto", "on", "interpret")
               and vwords in (1, 2)
               and int(b_starts.max() + b_lens.max()
                       if b_starts.size else 0) * stride < 2**31
               and (rf.on_tpu() or dma_fill == "interpret"))
    fill_slot_cap = _FILL_WORDS_CAP // stride

    # ---- short-span grouped-gather decision — the tiny-row/pwarp-bin
    # specialization (reference inc/binning.cuh:1-65,
    # inc/numeric.cuh:66-214) rebuilt as packing geometry: pad every
    # entry's slab span to a multiple of G so ONE G*k-word slice gather
    # per aligned G-block feeds G slots.  One aggregate-cost G (plus
    # G=1) keeps the class count bounded; a per-row argmin would
    # fragment the width grid.
    G_row = np.ones(p.size, dtype=np.int64)
    p_eff = p
    avg_words = (p * stride / np.maximum(1, row_vcnt[active])
                 if p.size else np.zeros(0))
    k_words = 2 if vwords == 1 else 4
    group_ok = (group != "off" and forced is None and p.size > 0
                and not precompute     # pre-takes make slices pointless
                and vwords in (1, 2)
                and (int(b_starts.max() + b_lens.max()
                         if b_starts.size else 0)
                     + _WORDS_PAD) * k_words < 2**31)
    if group_ok:
        idx_c = {}
        for G in _GROUP_CANDS:
            ce = -(-p_ent // G)
            cs1 = np.concatenate([[0], np.cumsum(ce)])
            idx_c[G] = (cs1[a_ptr[1:]] - cs1[a_ptr[:-1]])[active]

        def _gcost(G):
            return idx_c[G] * (_GROUP_IDX_NS[G] + G * _GROUP_TAIL_NS)

        # rows the fill path will take keep G=1 (fill beats any gather)
        short = (avg_words < _FILL_MIN_SPAN_WORDS if fill_ok
                 else np.ones(p.size, bool))
        best_g, best_agg = 1, float(_gcost(1)[short].sum())
        for G in _GROUP_CANDS[1:]:
            agg = float(_gcost(G)[short].sum())
            if agg < best_agg:
                best_agg, best_g = agg, G
        if best_g > 1:
            gwin = short & (_gcost(best_g) < _gcost(1))
            G_row = np.where(gwin, np.int64(best_g), np.int64(1))
            p_eff = np.where(gwin, idx_c[best_g] * best_g, p)

    wclass = _width_class(p_eff, min_width)
    wclass = -(-wclass // G_row) * G_row            # W % G == 0
    if precompute and p.size:
        # pow2 width grid: the flat Mosaic tail (esc_tail_flat) needs
        # aligned pow2 segments, and at its ~1 ns/slot the extra pad
        # slots vs the 1.25 grid cost less than the XLA sort tail on
        # any width.  Single-product rows take the W=1 direct path (the
        # one-nnz closed-form kernels, inc/numeric.cuh:66-99): no
        # duplicate columns possible -> no sort, no pack.
        pw = 2 ** np.ceil(np.log2(np.maximum(1, p_eff))
                          ).astype(np.int64)
        wclass = np.where(p_eff == 1, 1, np.maximum(2, pw))
    if pow2_fill_widths and active.size:
        # rows headed for fill classes (long average B spans): round the
        # width class up to a power of two so the fused Mosaic ESC tail
        # (pow2 bitonic segments, ops/esc_tail.py) engages — the tail
        # saving beats the <=1.33x extra slot padding on the ~2 ns/slot
        # fill path, but not on the ~26 ns/slot gather path, so short-
        # span rows keep the 1.5x grid
        bump = avg_words >= _FILL_MIN_SPAN_WORDS
        wclass = np.where(
            bump, 2 ** np.ceil(np.log2(np.maximum(1, wclass))).astype(
                np.int64), wclass)

    if forced is not None and active.size:
        # a union spec's width set may be sparser than this shard's
        # natural grid (per-shard class consolidation below merges small
        # classes before the union is taken): map every row up to the
        # smallest forced width that holds it
        fw = np.array(sorted(forced), dtype=np.int64)
        require_ok = wclass <= fw[-1]
        if not require_ok.all():
            raise ValueError("forced spec narrower than shard rows")
        wclass = fw[np.searchsorted(fw, wclass, side="left")]

    if forced is None and active.size:
        # class consolidation: every class costs a fixed per-dispatch
        # overhead (~1 ms of small-array ops on this host/transport;
        # scircuit's 20-class plan spent ~15 ms there) plus real compile
        # time, while merging a class into the next-larger width only
        # pads its rows' slots.  Greedily merge ascending while the
        # padding cost (per-slot expansion cost x extra slots) stays
        # below the fixed cost.  Per-slot cost: ~4 ns on the Mosaic fill
        # path, ~26 ns on the XLA gather path (bench/driver.py roofline).
        merge_ns = float(os.environ.get("MHSPGEMM_CLASS_MERGE_NS", "1e6"))
        span = avg_words
        for G in sorted(set(int(g) for g in np.unique(G_row))):
            widths_u = sorted(int(w) for w in
                              np.unique(wclass[G_row == G]))
            for i, w in enumerate(widths_u[:-1]):
                if w == 1:
                    continue    # keep the W=1 direct class intact
                sel = (wclass == w) & (G_row == G)
                nxt = widths_u[i + 1]
                if nxt > fill_slot_cap >= w:
                    continue    # don't push a fill-capable class past cap
                rows_n = int(sel.sum())
                fillish = (fill_ok and G == 1 and nxt <= fill_slot_cap
                           and float(span[sel].mean()) >=
                           _FILL_MIN_SPAN_WORDS)
                slot_ns = (10.0 if fillish
                           else _GROUP_IDX_NS[G] / G + _GROUP_TAIL_NS
                           if G > 1 else _MERGE_SLOT_NS)
                if rows_n * (nxt - w) * slot_ns < merge_ns:
                    wclass[sel] = nxt

    keys = (sorted(set(zip(wclass.tolist(), G_row.tolist())))
            if active.size else [])
    keys = sorted(set(keys) | {(int(w), 1) for w in (forced or ())})
    for W, G in keys:
        sel = (((wclass == int(W)) & (G_row == int(G)))
               if active.size else np.zeros(0, bool))
        rows_c = active[sel] if active.size else \
            np.zeros(0, np.int32)                           # original order
        if precompute and planned != "off" and rows_c.size:
            # order class rows by their first B source so each CHUNK
            # covers a contiguous slice of the B table — the planned
            # frontend's windowed schedules stay dense (chunking in row
            # order dropped per-chunk source density ~5x on scircuit's
            # W=1 class and tripled the schedule padding)
            fsrc = b_ptr[a_col[a_ptr[rows_c]]]
            rows_c = rows_c[np.argsort(fsrc, kind="stable")]
        cand = False
        fill_forced = False
        if forced is not None:
            # the union spec pins the frontend: attach the fill plan
            # exactly when the union says so (force=True skips the
            # per-shard cost model — specs must match across shards)
            fill_forced = bool(forced[W][3]) and fill_ok \
                and W <= fill_slot_cap
            cand = fill_forced
        elif fill_ok and G == 1 and W <= fill_slot_cap:
            pc = int(p[sel].sum())
            ec = int(row_vcnt[rows_c].sum())
            cand = fill_force or (pc * stride / max(1, ec)
                                  >= _FILL_MIN_SPAN_WORDS)
        # rows per chunk: bounded by the area budget AND the class's actual
        # row count (quantized so similar matrices share compiled shapes);
        # fill classes use the smaller VMEM-resident slab3 budget
        if forced is not None:
            rb, nchunks, eb_n = forced[W][:3]
        else:
            cap = fill_slot_cap if cand else area_cap
            if precompute and planned != "off" and not cand:
                # planned-frontend chunks: bound the routing-network
                # width (masks scale with pow2(chunk slots))
                cap = min(cap, _PF_CHUNK_CAP)
            rb = max(1, min(cap // W, quantize(max(1, rows_c.size))))
            nchunks = max(1, -(-rows_c.size // rb))
        nchunks = max(nchunks, -(-max(1, rows_c.size) // rb))
        vc = row_vcnt[rows_c]
        ecnt_max = int(np.max(np.add.reduceat(
            np.concatenate([vc, np.zeros(nchunks * rb - vc.size,
                                         np.int64)]),
            np.arange(0, nchunks * rb, rb)))) if vc.size else 0
        if forced is not None:
            # the union rb may regroup rows into fuller chunks than the
            # shard's own plan had — grow eb to fit (the caller re-unions
            # to a fixpoint)
            eb_n = max(eb_n, quantize(max(1, ecnt_max)))
        else:
            eb_n = quantize(max(1, ecnt_max))
        rows_pad = np.full(nchunks * rb, -1, dtype=np.int32)
        rows_pad[: rows_c.size] = rows_c

        # per-entry descriptors (drop empty B-row references: they advance
        # nothing and would collide at the next entry's dst slot) — via the
        # native C++ builder when available (one fused OpenMP pass), else
        # the vectorized numpy path below
        ent = (native_lib.bucket_entries(a_ptr, a_col, b_ptr, rows_c,
                                         rb, int(W), eb_n, nchunks)
               if csr_layout and G == 1 else None)
        if ent is not None:
            classes.append(ClassPlan(
                W=int(W), rb=rb, nchunks=nchunks, eb=eb_n,
                rows_g=rows_pad.reshape(nchunks, rb),
                ent_dst=ent[0], ent_src=ent[1], ent_len=ent[2],
                ent_aidx=ent[3],
                hold_passes=_log2_bound(W), seg_passes=_log2_bound(W)))
            if cand:
                _attach_fill_plan(classes[-1], stride,
                                  force=fill_force or fill_forced,
                                  planar=planar)
            continue
        cnt = a_row_nnz[rows_c].astype(np.int64)
        local_row = np.repeat(np.arange(rows_c.size, dtype=np.int64), cnt)
        starts = a_ptr[rows_c].astype(np.int64)
        bases = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        ent_e = (np.repeat(starts - bases, cnt)
                 + np.arange(int(cnt.sum()), dtype=np.int64))
        pe = p_ent[ent_e]
        keep = pe > 0
        ent_e, local_row, pe = ent_e[keep], local_row[keep], pe[keep]
        # exclusive cumsum of pe within each row; grouped classes pad
        # every entry's span to a multiple of G so each aligned G-block
        # of slots is fed by one G*k-word slice gather
        pe_eff = (-(-pe // G) * G) if G > 1 else pe
        pc = np.cumsum(pe_eff)
        row_first = np.concatenate([[True], local_row[1:] != local_row[:-1]])
        row_base = np.maximum.accumulate(
            np.where(row_first, pc - pe_eff, 0))
        off = pc - pe_eff - row_base

        chunk = local_row // rb
        slot = local_row - chunk * rb
        dst = (slot * W + off).astype(np.int64)

        ecnt = (np.bincount(chunk, minlength=nchunks).astype(np.int64)
                if chunk.size else np.zeros(nchunks, np.int64))
        eb = eb_n if forced is not None else (
            quantize(int(ecnt.max())) if ecnt.size and ecnt.max() else 1)
        shape = (nchunks, eb)
        ent_dst = np.full(shape, rb * W, dtype=np.int32)    # pad -> dropped
        ent_src = np.zeros(shape, dtype=np.int32)
        ent_len = np.zeros(shape, dtype=np.int32)
        ent_aidx = np.zeros(shape, dtype=np.int32)
        within = np.arange(ent_e.size, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ecnt)[:-1]]), ecnt)
        flat = chunk * eb + within        # one flat index, 1-D stores
        ent_dst.ravel()[flat] = dst.astype(np.int32)
        ent_src.ravel()[flat] = b_starts[a_col[ent_e]].astype(np.int32)
        ent_len.ravel()[flat] = pe.astype(np.int32)
        ent_aidx.ravel()[flat] = ent_e.astype(np.int32)

        classes.append(ClassPlan(
            W=int(W), rb=rb, nchunks=nchunks, eb=eb,
            rows_g=rows_pad.reshape(nchunks, rb),
            ent_dst=ent_dst, ent_src=ent_src, ent_len=ent_len,
            ent_aidx=ent_aidx,
            # pass counts standardized to log2(W): a tighter per-matrix
            # bound would save a few ~free vector passes but split the jit
            # cache per matrix — compile reuse wins on this backend
            hold_passes=_log2_bound(W),
            seg_passes=_log2_bound(W),
            G=int(G),
        ))
        if cand:
            _attach_fill_plan(classes[-1], stride,
                              force=fill_force or fill_forced,
                              planar=planar)

    if precompute:
        for c in classes:
            if not c.fill:
                _attach_slot_arrays(c)
        if planned != "off" and vwords in (1, 2):
            attach_planned(classes, int(b_ptr[-1]),
                           interp=(planned == "interpret"))
            demoted = 0
            total_nf = 0
            for c in classes:
                # LONG-SPAN W>1 classes the planned frontend could not
                # schedule fall back to the ESC frontend: its hold-scan
                # broadcasts the A operand per ENTRY where the flat
                # takes path pays two per-slot gathers (cage12 A/B: esc
                # 1.28 s vs flat pre 2.18 s).  Short-span classes keep
                # the flat path (entries ~ slots there, so ESC's seed
                # scatters cost more than the takes — webbase A/B: pre
                # 428 ms vs esc 481).  W=1 keeps the direct path.
                slots = c.W * c.rb * c.nchunks
                if not c.fill:
                    total_nf += slots
                ents = int((c.ent_len > 0).sum())
                span = (float(c.ent_len[c.ent_len > 0].mean())
                        if ents else 0.0)
                if (c.pre and not c.pf and c.W > 1 and not c.fill
                        and span >= 5.0):
                    c.pre = False
                    c.slot_src = None
                    c.slot_aidx = None
                    demoted += slots

    # flat offset of each row's slab in the concatenated class slabs
    # (extraction reads output j of row r at slab_row_start[r] + rank)
    slab_row_start = np.zeros(m, dtype=np.int32)
    base = 0
    for c in classes:
        rows = c.rows_g.reshape(-1)
        local = np.arange(rows.size, dtype=np.int64)
        live = rows >= 0
        slab_row_start[rows[live]] = (base + local[live] * c.W).astype(
            np.int32)
        base += rows.size * c.W
    if base >= 2**31 or intprod >= 2**31:
        raise ValueError(
            f"bucketed slab area {base} / intprod {intprod} exceeds int32 "
            "indexing; split the matrix (e.g. run the distributed "
            "row-partitioned pipeline)")
    m_cap = quantize(max(1, m))
    slab_row_start = np.concatenate(
        [slab_row_start, np.zeros(m_cap - m, np.int32)])
    return BucketPlan(m=m, m_cap=m_cap, classes=classes, intprod=intprod,
                      slab_row_start=slab_row_start,
                      dma_fill=dma_fill, vwords=vwords)


def estimate_cost_s(a_ptr: np.ndarray, a_col: np.ndarray,
                    b_ptr: np.ndarray, min_width: int = 8,
                    vwords: int = 2) -> float:
    """Light host-side estimate of the bucketed engine's warm runtime in
    seconds (no descriptor building) — drives the adaptive engine choice
    (pipeline.choose_engine).  Sums the per-class measured-cost model:
    Mosaic-fill classes at ~4 ns/slot, XLA-gather classes at
    ~_GATHER_NS_PER_SLOT, plus ~30%% for extraction."""
    blens = np.diff(b_ptr).astype(np.int64)
    p_ent = blens[a_col]
    cs = np.concatenate([[0], np.cumsum(p_ent)])
    p_row = cs[a_ptr[1:]] - cs[a_ptr[:-1]]
    active = p_row > 0
    if not active.any():
        return 0.0
    p = p_row[active]
    w = _width_class(p, min_width)
    vcs = np.concatenate([[0], np.cumsum(p_ent > 0)])
    vc = (vcs[a_ptr[1:]] - vcs[a_ptr[:-1]])[active]
    stride = 1 + vwords
    total = 0.0
    fill_possible = rf.on_tpu() and int(b_ptr[-1]) * stride < 2**31
    for W in np.unique(w):
        sel = w == W
        slots = int(W) * int(sel.sum())
        avg_words = p[sel].sum() * stride / max(1, vc[sel].sum())
        fill = (fill_possible and W <= _FILL_WORDS_CAP // stride
                and avg_words >= _FILL_MIN_SPAN_WORDS)
        # measured end-to-end main-stage rates: fill ~10 ns/slot (cant,
        # r3); gather path = takes frontend + seeds/tail vector work
        per_slot = 10.0 if fill else _GATHER_NS_PER_SLOT + 5.0
        total += slots * per_slot * 1e-9
    return total * 1.3


def upload_plan(plan: BucketPlan) -> None:
    """H2D of the descriptor arrays (once per plan; the workspace-alloc
    analogue of Tool::allocate, src/Tool.cu:4-73)."""
    if plan.dev is not None:
        return
    plan.dev = [
        tuple(jnp.asarray(x) for x in
              ((c.rows_g, c.ent_dst, c.ent_len, c.ent_aidx, c.row_len,
                c.win_row, c.runs) if c.fill else
               (c.rows_g, c.slot_src, c.slot_aidx,
                c.pf_host["bg_wblk"],
                c.pf_host["bg_rowsel"], c.pf_host["bg_lane"],
                c.pf_host["bt_masks"], c.pf_host["ag_wblk"],
                c.pf_host["ag_rowsel"], c.pf_host["ag_lane"],
                c.pf_host["at_masks"], c.pf_host["flags"])
               if c.pf else
               (c.rows_g, c.slot_src, c.slot_aidx) if c.pre else
               (c.rows_g, c.ent_dst, c.ent_src, c.ent_len, c.ent_aidx)))
        for c in plan.classes
    ]
    if plan.slab_row_start is not None:
        plan.dev_slab_start = jnp.asarray(plan.slab_row_start)


def build_pairs(b_col: np.ndarray, b_val: np.ndarray, vwords: int,
                wrows_max: int, df: bool = False) -> np.ndarray:
    """Interleaved transport stream for the ragged fill: per B nonzero,
    [col, val word(s)] as int32 — a B row's data is one contiguous span.
    Padded so any window row read stays in bounds.  Returns i32[NR, 128].

    ``df``: carry f64 values as Dekker-split (hi, lo) f32 words instead
    of raw f64 bit-halves, so the device side never touches emulated f64
    (the TPU has no native double; see config.SpGEMMConfig.df32).
    """
    nnz = b_col.shape[0]
    stride = 1 + vwords
    pairs = np.zeros((nnz, stride), np.int32)
    pairs[:, 0] = b_col
    if df:
        assert vwords == 2 and b_val.dtype == np.float64
        hi, lo = dekker_split_np(b_val)
        pairs[:, 1] = hi.view(np.int32)
        pairs[:, 2] = lo.view(np.int32)
    else:
        pairs[:, 1:] = b_val.view(np.int32).reshape(nnz, vwords)
    flat = pairs.reshape(-1)
    rows = (-(-(_FILL_BIAS_WORDS + flat.size) // 128)
            + wrows_max + rf.PAD_ROWS)
    out = np.zeros((rows, 128), np.int32)
    out.reshape(-1)[_FILL_BIAS_WORDS: _FILL_BIAS_WORDS + flat.size] = flat
    return out


def pairs_rows(nnz: int, vwords: int, wrows_max: int) -> int:
    """Static row count of the [NR, 128] pairs stream for ``nnz``
    payload nonzeros (shared by build_pairs and pairs_device)."""
    stride = 1 + vwords
    return (-(-(_FILL_BIAS_WORDS + nnz * stride) // 128)
            + wrows_max + rf.PAD_ROWS)


def pairs_plane_pitch(nnz: int, wrows_max: int) -> int:
    """Row pitch of ONE plane of the planar pairs stream: bias + data +
    window slack, so any window read from the last run of a plane stays
    inside that plane's rows (the next plane's data is never scanned)."""
    return -(-(_FILL_BIAS_WORDS + nnz) // 128) + wrows_max + rf.PAD_ROWS


def build_pairs_planar(b_col: np.ndarray, b_val: np.ndarray, vwords: int,
                       wrows_max: int, df: bool = False) -> np.ndarray:
    """Planar transport stream for the ragged fill: one [pitch, 128]
    PLANE per word ([cols..][hi..][lo..]) stacked vertically, each with
    the same bias prepad — one run descriptor (element units) drives
    every plane via the kernel's plane strides (nplanes / src_stride_
    rows / dst_stride), so the slab arrives deinterleaved and the XLA
    stride-slicing after the fill disappears (see _attach_fill_plan)."""
    nnz = b_col.shape[0]
    if df:
        assert vwords == 2 and b_val.dtype == np.float64
        hi, lo = dekker_split_np(b_val)
        planes = [b_col.astype(np.int32), hi.view(np.int32),
                  lo.view(np.int32)]
    else:
        vw = b_val.view(np.int32).reshape(nnz, vwords) if nnz else \
            np.zeros((0, vwords), np.int32)
        planes = [b_col.astype(np.int32)] + \
            [vw[:, i].copy() for i in range(vwords)]
    pitch = pairs_plane_pitch(nnz, wrows_max)
    out = np.zeros((len(planes) * pitch, 128), np.int32)
    flat = out.reshape(-1)
    for pidx, pl_ in enumerate(planes):
        base = pidx * pitch * 128 + _FILL_BIAS_WORDS
        flat[base: base + nnz] = pl_
    return out


def pairs_device(b_col: jax.Array, b_val, vwords: int,
                 wrows_max: int, df: bool = False) -> jax.Array:
    """Device-side ``build_pairs``: interleave [col, val word(s)] into
    the [NR, 128] transport stream from arrays already ON DEVICE.  The
    distributed engines call this INSIDE the shard kernel, after the
    collective (all_gather / all_to_all) that materialises the shard's
    B payload — so B still travels compact over ICI/DCN and only the
    local re-encode pays the interleave copy (one bandwidth-bound
    stack+reshape).  ``df``: ``b_val`` is an (hi, lo) f32 pair."""
    nnz = b_col.shape[0]
    col = b_col.astype(jnp.int32)
    if df:
        words = (col,
                 jax.lax.bitcast_convert_type(b_val[0], jnp.int32),
                 jax.lax.bitcast_convert_type(b_val[1], jnp.int32))
    else:
        # f64 values MUST arrive as Dekker (hi, lo) f32 planes (df=True):
        # bitcast_convert_type f64 -> i32 does not lower on this TPU
        # backend (memory: mosaic-kernel-gotchas), so there is no raw
        # f64 word encode on device
        assert vwords == 1, "device-side f64 pairs require df=True"
        words = (col, jax.lax.bitcast_convert_type(
            b_val.astype(jnp.float32), jnp.int32))
    flat = jnp.stack(words, axis=1).reshape(-1)
    rows = pairs_rows(nnz, vwords, wrows_max)
    out = jnp.zeros((rows * 128,), jnp.int32)
    out = jax.lax.dynamic_update_slice(
        out, flat, (np.int32(_FILL_BIAS_WORDS),))
    return out.reshape(rows, 128)


def words_k(vwords: int) -> int:
    """Words per B nonzero in the wide-gather operand: column + value
    word(s), padded to a power of two (2 for f32, 4 for f64/df32)."""
    return 2 if vwords == 1 else 4


def build_words(b_col: np.ndarray, b_val: np.ndarray, vwords: int,
                df: bool = False) -> Optional[np.ndarray]:
    """Wide-gather operand for the XLA-gather expansion classes: per B
    nonzero, ``k`` consecutive int32 words ``[col, value word(s), pad]``
    in one FLAT array — one gather index fetches the column and the
    value together.  XLA's TPU gather cost is per-INDEX, not per-byte
    (measured, scripts/micro_gather.py), so this replaces the frontend's
    2-3 separate takes per slot with one.  Returns None when int32
    word addressing would overflow (caller falls back to the takes)."""
    nnz = b_col.shape[0]
    k = words_k(vwords)
    if (nnz + 1 + _WORDS_PAD) * k >= 2**31:
        return None
    # _WORDS_PAD zero products of tail slack: a grouped G*k-word slice
    # anchored at the last real product stays in bounds
    w = np.zeros((max(nnz, 1) + _WORDS_PAD, k), np.int32)
    w[:nnz, 0] = b_col
    if nnz:
        if df:
            assert vwords == 2 and b_val.dtype == np.float64
            hi, lo = dekker_split_np(b_val)
            w[:nnz, 1] = hi.view(np.int32)
            w[:nnz, 2] = lo.view(np.int32)
        elif vwords == 1:
            w[:nnz, 1] = b_val.astype(np.float32).view(np.int32)
        else:
            w[:nnz, 1:3] = b_val.view(np.int32).reshape(nnz, 2)
    return w.reshape(-1)


_WG_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))


def _words_gather(words: jax.Array, src: jax.Array, k: int,
                  scale: Optional[int] = None) -> jax.Array:
    """One k-word slice per index: ``out[i] = words[scale*src[i] : +k]``
    (``scale`` defaults to ``k``; grouped gathers read ``G*wk`` words
    from a ``wk``-word-per-product operand)."""
    return jax.lax.gather(
        words, (src * np.int32(scale or k))[:, None], _WG_DNUMS,
        slice_sizes=(k,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


# ---------------------------------------------------------------------------
# Device: 2-D scan helpers (segments never cross row boundaries)
# ---------------------------------------------------------------------------

def _hold_scan_rows(values: Sequence[jax.Array], starts: jax.Array,
                    passes: int) -> Tuple[jax.Array, ...]:
    """Broadcast the values at each segment start down their segment, per
    row (segments marked by ``starts``) — the no-gather replacement for
    both ``jnp.repeat`` and per-element descriptor lookups.  Slots beyond
    ``2**passes`` of a start keep their seed (callers make unseeded slots
    self-invalidating: len 0)."""
    vs = list(values)
    s = starts
    dist = 1
    for _ in range(passes):
        ss = jnp.concatenate(
            [jnp.zeros((s.shape[0], dist), bool), s[:, :-dist]], axis=1)
        take = (~s) & ss
        for i, v in enumerate(vs):
            sv = jnp.concatenate([v[:, :dist], v[:, :-dist]], axis=1)
            vs[i] = jnp.where(take, sv, v)
        s = s | ss
        dist *= 2
    return tuple(vs)


def _seg_sum_rows(values: jax.Array, new: jax.Array,
                  passes: int) -> jax.Array:
    """Segmented inclusive sum along rows (``new`` marks segment starts) —
    the hash-accumulate analogue of the reference's atomicAdd loops."""
    v, f = values, new
    dist = 1
    for _ in range(passes):
        sv = jnp.concatenate([jnp.zeros_like(v[:, :dist]), v[:, :-dist]],
                             axis=1)
        sf = jnp.concatenate(
            [jnp.ones((v.shape[0], dist), bool), f[:, :-dist]], axis=1)
        v = jnp.where(f, v, v + sv)
        f = f | sf
        dist *= 2
    return v


# ---------------------------------------------------------------------------
# Device: per-chunk ESC kernel + whole-matrix program
# ---------------------------------------------------------------------------

def _expand_seeds(ent_dst, ent_src, ent_len, ent_aidx, a_val,
                  *, W: int, rb: int, hold_passes: int,
                  df: bool = False):
    """Seed per-entry descriptors at their destination slots (entry-count
    sized scatters), then ONE shared hold-scan broadcasts them down their
    segments: every slot learns (src base, len, segment start, a-value)
    in log2(max segment) vector passes — no int64, no cummax, no repeat.
    Returns (src0, valid, AV, off); ``AV`` is an (hi, lo) f32 pair under
    ``df`` (a_val then arrives as a stacked [2, nnz] f32 Dekker split)."""
    RW = rb * W

    def seed(vals, dtype, fill=0):
        return jnp.full((RW,), fill, dtype).at[ent_dst].set(
            vals, mode="drop").reshape(rb, W)

    s_src = seed(ent_src, jnp.int32)
    s_len = seed(ent_len, jnp.int32)
    s_pos = seed(ent_dst, jnp.int32)
    if df:
        s_av = (seed(a_val[0][ent_aidx], jnp.float32),
                seed(a_val[1][ent_aidx], jnp.float32))
    else:
        s_av = (seed(a_val[ent_aidx], a_val.dtype),)
    starts = jnp.zeros((RW,), bool).at[ent_dst].set(
        True, mode="drop").reshape(rb, W)

    out = _hold_scan_rows((s_src, s_len, s_pos) + s_av, starts,
                          hold_passes)
    src0, len0, dst_s = out[:3]
    AV = out[3:] if df else out[3]

    pos = jnp.arange(RW, dtype=jnp.int32).reshape(rb, W)
    off = pos - dst_s
    valid = (off >= 0) & (off < len0)
    return src0, valid, AV, off


def _seg_sum_rows_df(vh, vl, new, passes: int):
    """Segmented inclusive sum along rows in double-f32: the same
    Hillis-Steele recursion as _seg_sum_rows with each add replaced by a
    compensated two-sum (esc_tail.df_add_xla) — error depth is
    log2(run), so the accumulated relative error stays ~passes * 2^-47,
    far inside the 1e-9 comparator."""
    f = new
    dist = 1
    for _ in range(passes):
        svh = jnp.concatenate(
            [jnp.zeros_like(vh[:, :dist]), vh[:, :-dist]], axis=1)
        svl = jnp.concatenate(
            [jnp.zeros_like(vl[:, :dist]), vl[:, :-dist]], axis=1)
        sf = jnp.concatenate(
            [jnp.ones((vh.shape[0], dist), bool), f[:, :-dist]], axis=1)
        nh, nl = df_add_xla(vh, vl, svh, svl)
        vh = jnp.where(f, vh, nh)
        vl = jnp.where(f, vl, nl)
        f = f | sf
        dist *= 2
    return vh, vl


def _chunk_tail(K, prod, *, rb: int, seg_passes: int, df: bool = False,
                W: int = 0, tail: str = "off"):
    """Shared per-chunk tail: sort by column, segment-sum equal-column
    runs (the hash-accumulate analogue, inc/numeric.cuh:215-258), then
    left-pack the survivors (table compaction, inc/numeric.cuh:264-297).

    Under ``df`` the value payload is an (hi, lo) f32 pair and the
    returned ``oV`` is stacked [2, rb, W] — no f64 op ever runs.

    ``tail`` in ("on", "interpret") routes power-of-two-width classes
    on the f32/df32 value pipeline through the fused Mosaic kernel
    (ops/esc_tail.py: bitonic in-segment sort + compensated segmented
    accumulate + left-pack, all in VMEM) instead of the XLA ops below
    (config.SpGEMMConfig.esc_tail).

    ``W == 1``: the single-product-row direct path (the reference's
    one-nnz closed-form kernels, inc/numeric.cuh:66-99) — one product
    per row means no duplicate columns, no sort, no pack."""
    if W == 1:
        if df:
            H, L = prod
            nnz_row = jnp.sum(K < _I32_MAX, axis=1, dtype=jnp.int32)
            return K, jnp.stack([H, L]), nnz_row
        nnz_row = jnp.sum(K < _I32_MAX, axis=1, dtype=jnp.int32)
        return K, prod, nnz_row
    f32_vals = df or (not isinstance(prod, tuple)
                      and prod.dtype == jnp.float32)
    if (tail in ("on", "interpret") and f32_vals
            and esc_tail_mod.supported_w2(W)):
        H, L = prod if df else (prod, None)
        bits = jax.lax.bitcast_convert_type
        row_len = jnp.full((rb,), np.int32(W))   # K is pre-masked
        oK, oh, ol = esc_tail_mod.esc_tail(
            K, bits(H, jnp.int32), bits(L if df else H, jnp.int32),
            row_len, w2=W, f64=df, interpret=(tail == "interpret"))
        nnz_row = jnp.sum((oK < _I32_MAX).astype(jnp.int32), axis=1,
                          dtype=jnp.int32)
        if df:
            oV = jnp.stack([bits(oh, jnp.float32),
                            bits(ol, jnp.float32)])
        else:
            oV = bits(oh, jnp.float32)
        return oK, oV, nnz_row
    if df:
        H, L = prod
        sK, sH, sL = jax.lax.sort((K, H, L), num_keys=1, dimension=1)
        new = jnp.concatenate(
            [jnp.ones((rb, 1), bool), sK[:, 1:] != sK[:, :-1]], axis=1)
        runH, runL = _seg_sum_rows_df(sH, sL, new, seg_passes)
        ends = (jnp.concatenate(
            [new[:, 1:], jnp.ones((rb, 1), bool)], axis=1)
            & (sK < _I32_MAX))
        nnz_row = jnp.sum(ends, axis=1, dtype=jnp.int32)
        rank = jnp.cumsum(ends, axis=1, dtype=jnp.int32) - 1
        key2 = jnp.where(ends, rank, _I32_MAX)
        _, oC, oH, oL = jax.lax.sort((key2, sK, runH, runL),
                                     num_keys=1, dimension=1)
        return oC, jnp.stack([oH, oL]), nnz_row
    sK, sV = jax.lax.sort((K, prod), num_keys=1, dimension=1)
    new = jnp.concatenate(
        [jnp.ones((rb, 1), bool), sK[:, 1:] != sK[:, :-1]], axis=1)
    run = _seg_sum_rows(sV, new, seg_passes)
    ends = (jnp.concatenate([new[:, 1:], jnp.ones((rb, 1), bool)], axis=1)
            & (sK < _I32_MAX))
    nnz_row = jnp.sum(ends, axis=1, dtype=jnp.int32)
    rank = jnp.cumsum(ends, axis=1, dtype=jnp.int32) - 1
    key2 = jnp.where(ends, rank, _I32_MAX)
    _, oC, oV = jax.lax.sort((key2, sK, run), num_keys=1, dimension=1)
    return oC, oV, nnz_row


def _product(AV, bv, valid, df: bool):
    """Masked product: double-f32 two-product under ``df`` (both factors
    arrive as (hi, lo) pairs), plain multiply otherwise."""
    if df:
        ph, plo = df_mul_xla(AV[0], AV[1], bv[0], bv[1])
        z = jnp.float32(0)
        return (jnp.where(valid, ph, z), jnp.where(valid, plo, z))
    return jnp.where(valid, AV * bv, jnp.zeros((), bv.dtype))


def _front_gather(ent_dst, ent_src, ent_len, ent_aidx, a_val, b_col,
                  b_val, *, W: int, rb: int, hold_passes: int,
                  df: bool = False, b_words=None, wk: int = 0,
                  vdtype=None, G: int = 1):
    """Shared XLA-gather expansion frontend.

    With ``b_words`` (the wide-gather operand, :func:`build_words`):
    ONE k-word slice gather per slot fetches column + value words
    together (~14 ns/slot) — XLA's TPU gather cost is per-index.
    With ``G > 1`` (grouped classes: every entry span G-aligned by the
    planner), one G*k-word slice gather per aligned G-block feeds G
    slots — the short-span specialization, ~G x fewer gather indices.
    Without ``b_words``: 2-3 separate takes (~26 ns/slot measured);
    under ``df`` the value gathers read the two f32 planes of the
    stacked Dekker split.  Returns (K masked, bv, valid, AV)."""
    src0, valid, AV, off = _expand_seeds(
        ent_dst, ent_src, ent_len, ent_aidx, a_val,
        W=W, rb=rb, hold_passes=hold_passes, df=df)
    src = jnp.where(valid, src0 + off, 0).reshape(-1)
    if b_words is not None and G > 1:
        # block leaders: slots at in-row positions == 0 (mod G).  The
        # planner G-aligns entry starts, so a block's G slots are G
        # consecutive products of ONE entry (holes masked by ``valid``);
        # the leader is always a real product when the block has any.
        srcL = src.reshape(rb * W // G, G)[:, 0]
        g = _words_gather(b_words, srcL, G * wk, scale=wk)
        g = g.reshape(rb * W, wk)
        K = jnp.where(valid, g[:, 0].reshape(rb, W), _I32_MAX)
        bits = jax.lax.bitcast_convert_type
        if df:
            bv = (bits(g[:, 1], jnp.float32).reshape(rb, W),
                  bits(g[:, 2], jnp.float32).reshape(rb, W))
        elif wk == 2:
            bv = bits(g[:, 1], jnp.float32).reshape(rb, W).astype(
                vdtype or jnp.float32)
        else:                       # raw f64: two little-endian words
            bv = bits(g[:, 1:3], jnp.float64).reshape(rb, W)
        return K, bv, valid, AV
    if b_words is not None:
        g = _words_gather(b_words, src, wk)
        K = jnp.where(valid, g[:, 0].reshape(rb, W), _I32_MAX)
        bits = jax.lax.bitcast_convert_type
        if df:
            bv = (bits(g[:, 1], jnp.float32).reshape(rb, W),
                  bits(g[:, 2], jnp.float32).reshape(rb, W))
        elif wk == 2:
            bv = bits(g[:, 1], jnp.float32).reshape(rb, W).astype(
                vdtype or jnp.float32)
        else:                       # raw f64: two little-endian words
            bv = bits(g[:, 1:3], jnp.float64).reshape(rb, W)
        return K, bv, valid, AV
    K = jnp.where(valid, b_col[src].reshape(rb, W), _I32_MAX)  # gather #1
    if df:
        bv = (b_val[0][src].reshape(rb, W),                    # gather #2
              b_val[1][src].reshape(rb, W))                    # gather #3
    else:
        bv = b_val[src].reshape(rb, W)                         # gather #2
    return K, bv, valid, AV


def _chunk_esc(rows_g, ent_dst, ent_src, ent_len, ent_aidx,
               a_val, b_col, b_val, *, W: int, rb: int,
               hold_passes: int, seg_passes: int, df: bool = False,
               tail: str = "off", b_words=None, wk: int = 0,
               vdtype=None, G: int = 1):
    """One [rb, W] chunk: expand, multiply, sort, accumulate, left-pack."""
    K, bv, valid, AV = _front_gather(
        ent_dst, ent_src, ent_len, ent_aidx, a_val, b_col, b_val,
        W=W, rb=rb, hold_passes=hold_passes, df=df, b_words=b_words,
        wk=wk, vdtype=vdtype, G=G)
    prod = _product(AV, bv, valid, df)
    return _chunk_tail(K, prod, rb=rb, seg_passes=seg_passes, df=df,
                       W=W, tail=tail)


def _nnz_from_packed_flat(oK, W: int, rb: int) -> jax.Array:
    """Per-row output count from flat left-packed keys: XOR-fold the
    valid flags within each aligned W-wide lane segment (every lane ends
    holding its segment's total), then one strided slice — no [rb, W]
    materialisation."""
    v = (oK < _I32_MAX).astype(jnp.int32)
    if W <= 128:
        v2 = v.reshape(-1, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, v2.shape, 1)
        d = 1
        while d < W:
            up = jnp.roll(v2, -d, axis=1)
            dn = jnp.roll(v2, d, axis=1)
            v2 = v2 + jnp.where((lane & d) == 0, up, dn)
            d <<= 1
        return v2[:, ::W].reshape(-1)
    return jnp.sum(v.reshape(rb, W // 128, 128), axis=(1, 2),
                   dtype=jnp.int32)


def _chunk_pre(rows_g, slot_src, slot_aidx, a_val, b_col, b_val, *,
               W: int, rb: int, seg_passes: int, df: bool = False,
               tail: str = "off", vdtype=None):
    """One rb*W-slot chunk on the PRECOMPUTED frontend, entirely in FLAT
    layout: the per-slot source/A-value indices were evaluated on host
    at plan time (_attach_slot_arrays), so expansion is pure takes — no
    seed scatters, no hold-scan — and no intermediate is ever shaped
    [rb, W] (for W ≪ 128 that layout lane-pads 128/W× in HBM; round-5
    profiling measured it as the dominant class cost, e.g. scircuit's
    W=1 class at 40 ns/slot for takes + one multiply).  The tail runs
    the flat Mosaic kernel (esc_tail_flat) when enabled and supported;
    otherwise the XLA [rb, W] tail remains the fallback.  Returns flat
    (oC [L], oV [2, L] | [L], nnz_row [rb])."""
    L = rb * W
    valid = slot_src >= 0
    srcc = jnp.where(valid, slot_src, 0)
    K = jnp.where(valid, b_col[srcc], _I32_MAX)
    ai = jnp.where(valid, slot_aidx, 0)
    if df:
        bv = (b_val[0][srcc], b_val[1][srcc])
        AV = (a_val[0][ai], a_val[1][ai])
    else:
        bv = b_val[srcc]
        AV = a_val[ai]
    prod = _product(AV, bv, valid, df)
    return _flat_tail(K, prod, valid, W=W, rb=rb,
                      seg_passes=seg_passes, df=df, tail=tail)


def _flat_tail(K, prod, valid, *, W: int, rb: int, seg_passes: int,
               df: bool, tail: str):
    """Shared flat-layout tail: Mosaic esc_tail_flat when enabled and
    supported, XLA [rb, W] sort tail otherwise; W == 1 is the direct
    no-dedup path.  Returns flat (oC [L], oV [2, L] | [L],
    nnz_row [rb])."""
    L = rb * W
    if W == 1:
        # single-product rows (the one-nnz closed-form kernels,
        # inc/numeric.cuh:66-99): no duplicates possible — no tail
        nnz_row = valid.astype(jnp.int32)
        return K, (jnp.stack(prod) if df else prod), nnz_row
    f32v = df or (not isinstance(prod, tuple)
                  and prod.dtype == jnp.float32)
    if (tail in ("on", "interpret") and f32v
            and esc_tail_mod.supported_w2(W)):
        H, Lo = prod if df else (prod, None)
        bits = jax.lax.bitcast_convert_type
        oK, oh, ol = esc_tail_mod.esc_tail_flat(
            K, bits(H, jnp.int32), bits(Lo if df else H, jnp.int32),
            w2=W, f64=df, interpret=(tail == "interpret"))
        nnz_row = _nnz_from_packed_flat(oK, W, rb)
        if df:
            oV = jnp.stack([bits(oh, jnp.float32),
                            bits(ol, jnp.float32)])
        else:
            oV = bits(oh, jnp.float32)
        return oK, oV, nnz_row
    Kr = K.reshape(rb, W)
    pr = ((prod[0].reshape(rb, W), prod[1].reshape(rb, W)) if df
          else prod.reshape(rb, W))
    oC, oV, nnz_row = _chunk_tail(Kr, pr, rb=rb, seg_passes=seg_passes,
                                  df=df, W=W, tail="off")
    oV = oV.reshape(2, L) if df else oV.reshape(L)
    return oC.reshape(L), oV, nnz_row


def _chunk_planned(rows_g, slot_src, slot_aidx, bg_wblk, bg_rowsel,
                   bg_lane, bt_masks, ag_wblk, ag_rowsel, ag_lane,
                   at_masks, flags,
                   a_val, b_col, b_val, a_words, *, W: int, rb: int,
                   seg_passes: int, df: bool = False,
                   tail: str = "off", pf_spec=(), vdtype=None):
    """One chunk on the PLANNED frontend (ops/planned.py): windowed
    VMEM gathers with host-static schedules replace the ~8 ns/index XLA
    takes; static routing networks deliver B records to slot order and
    A run-head records to their runs (in-kernel propagate).  All
    schedules derive from the plan-static slot_src/slot_aidx."""
    from . import planned as pn
    m_b, nst_b, m_a, nst_a, interp, a_route = pf_spec
    L = rb * W
    bits = jax.lax.bitcast_convert_type
    valid = slot_src >= 0
    if df:
        btabs = [b_col, bits(b_val[0], jnp.int32),
                 bits(b_val[1], jnp.int32)]
        atabs = [bits(a_val[0], jnp.int32), bits(a_val[1], jnp.int32)]
    else:
        btabs = [b_col, bits(b_val.astype(jnp.float32), jnp.int32)]
        atabs = [bits(a_val.astype(jnp.float32), jnp.int32)]
    g = pn.pgather(btabs, bg_wblk, bg_rowsel, bg_lane,
                   interpret=interp)
    r = pn.proute(g, bt_masks, nst_b, interpret=interp)
    K = jnp.where(valid, r[0][:L], _I32_MAX)
    if a_route:
        ga = pn.pgather(atabs, ag_wblk, ag_rowsel, ag_lane,
                        interpret=interp)
        ra = pn.proute(ga, at_masks, nst_a, hold_w2=W, flags=flags,
                       interpret=interp)
        ra = [x[:L] for x in ra]
    else:
        # sparse scrambled aidx: one k=2 slice gather per slot on the
        # interleaved (hi, lo) a_words operand
        ai = jnp.where(valid, slot_aidx, 0)
        if df:
            rec = _words_gather(a_words, ai, 2)
            ra = [rec[:, 0], rec[:, 1]]
        else:
            ra = [bits(a_val.astype(jnp.float32), jnp.int32)[ai]]
    if df:
        bv = (bits(r[1][:L], jnp.float32), bits(r[2][:L], jnp.float32))
        AV = (bits(ra[0], jnp.float32), bits(ra[1], jnp.float32))
    else:
        bv = bits(r[1][:L], jnp.float32)
        AV = bits(ra[0], jnp.float32)
    prod = _product(AV, bv, valid, df)
    return _flat_tail(K, prod, valid, W=W, rb=rb,
                      seg_passes=seg_passes, df=df, tail=tail)


def _front_fill(ent_dst, ent_aidx, row_len, win_row, runs, a_val,
                pairs2d, *, W: int, rb: int, hold_passes: int,
                stride: int, wrows: int, out_rows: int, vdtype,
                interpret: bool, df: bool = False,
                planar: bool = False):
    """Shared Mosaic-fill expansion frontend: the B columns and value
    words stream in as contiguous runs at DMA bandwidth
    (ops/ragged_fill.py) instead of per-element gathers.  Validity is
    one comparison against the plan-time per-row product count; only
    the A-value broadcast needs a (single-value) hold-scan.
    Returns (K masked, bv, valid, AV).  Under ``df`` the two value
    words per slot are the Dekker (hi, lo) f32 pair straight off the
    stream (build_pairs df=True) — no i32x2 -> f64 emulated bitcast.
    ``planar``: the stream/slab are one plane per word and ``out_rows``
    is PER PLANE — the planes come back deinterleaved (contiguous
    static slices instead of the measured-expensive stride slicing)."""
    if planar:
        slabp = rf.ragged_fill(win_row, runs, pairs2d,
                               out_rows=stride * out_rows, wrows=wrows,
                               nplanes=stride,
                               src_stride_rows=pairs2d.shape[0] // stride,
                               dst_stride=out_rows * 128,
                               interpret=interpret)
        flat = slabp.reshape(-1)

        def plane(p):
            return jax.lax.slice_in_dim(
                flat, p * out_rows * 128, p * out_rows * 128 + rb * W
            ).reshape(rb, W)

        K0 = plane(0)
        if df:
            bv = (jax.lax.bitcast_convert_type(plane(1), jnp.float32),
                  jax.lax.bitcast_convert_type(plane(2), jnp.float32))
        elif stride == 3:
            bv = jax.lax.bitcast_convert_type(
                jnp.stack([plane(1), plane(2)], axis=-1),
                jnp.float64).astype(vdtype)
        else:
            bv = jax.lax.bitcast_convert_type(
                plane(1), jnp.float32).astype(vdtype)
    else:
        slab3 = rf.ragged_fill(win_row, runs, pairs2d,
                               out_rows=out_rows, wrows=wrows,
                               interpret=interpret)
        flat3 = slab3.reshape(-1)[: rb * W * stride].reshape(
            rb * W, stride)
        K0 = flat3[:, 0].reshape(rb, W)
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
    AV = _hold_scan_rows(s_av, starts, hold_passes)
    if not df:
        AV = AV[0]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (rb, W), 1)
             < row_len[:, None])
    K = jnp.where(valid, K0, _I32_MAX)
    return K, bv, valid, AV


def _chunk_fill(rows_g, ent_dst, ent_len, ent_aidx, row_len, win_row,
                runs, a_val, pairs2d, *, W: int, rb: int,
                hold_passes: int, seg_passes: int, stride: int,
                wrows: int, out_rows: int, vdtype, interpret: bool,
                df: bool = False, tail: str = "off",
                planar: bool = False):
    """One [rb, W] chunk with the Mosaic ragged-fill expansion."""
    K, bv, valid, AV = _front_fill(
        ent_dst, ent_aidx, row_len, win_row, runs, a_val, pairs2d,
        W=W, rb=rb, hold_passes=hold_passes, stride=stride, wrows=wrows,
        out_rows=out_rows, vdtype=vdtype, interpret=interpret, df=df,
        planar=planar)
    prod = _product(AV, bv, valid, df)
    return _chunk_tail(K, prod, rb=rb, seg_passes=seg_passes, df=df,
                       W=W, tail=tail)


def plan_buckets_sharded(a_ptr: np.ndarray, a_col: np.ndarray,
                         n_shards: int, rows_per_shard: int,
                         b_ptr: Optional[np.ndarray] = None,
                         min_width: int = 128, area_cap: int = 1 << 23,
                         b_starts=None, b_lens=None,
                         a_col_shards: Optional[List[np.ndarray]] = None,
                         dma_fill: str = "off", vwords: int = 2,
                         bounds: Optional[np.ndarray] = None,
                         ) -> List[BucketPlan]:
    """Per-shard bucket plans with IDENTICAL class specs, so one jitted
    program serves every shard of a row-partitioned mesh (SURVEY.md
    §2.3: the bucketed engine under shard_map).

    Shard d owns rows [d*R, (d+1)*R).  ``b_starts``/``b_lens`` may be
    per-shard lists (ragged halo layout) or single arrays (replicated /
    gathered layout).  Two-phase: plan each shard free-form, union the
    class shapes (max rb/nchunks/eb per width) AND the expansion
    frontend (a width class rides the Mosaic fill when ANY shard's cost
    model picks it — homogeneous layouts agree in practice), then
    replan forced and pad the per-shard fill descriptors (win_row/runs)
    to one union window count so every device compiles ONE program."""
    R = rows_per_shard
    m = a_ptr.shape[0] - 1

    def shard_csr(d):
        if bounds is None:
            lo, hi = min(d * R, m), min((d + 1) * R, m)
        elif getattr(bounds, "ndim", 1) == 2:
            # explicit (lo, hi) per shard — the 2-D grid strategy maps
            # virtual shard r*Dc+c to row range r (ranges may repeat)
            lo, hi = int(bounds[d][0]), int(bounds[d][1])
        else:       # work-balanced partition: explicit owned row ranges
            lo, hi = int(bounds[d]), int(bounds[d + 1])
        ptr = (a_ptr[lo:hi + 1] - a_ptr[lo]).astype(a_ptr.dtype)
        if hi <= lo:
            ptr = np.zeros(1, a_ptr.dtype)
        ptr = np.concatenate([ptr, np.full(R + 1 - ptr.size, ptr[-1],
                                           ptr.dtype)])
        if a_col_shards is not None:
            col = a_col_shards[d]         # e.g. halo-remapped columns
        elif hi > lo:
            col = a_col[a_ptr[lo]: a_ptr[hi]]
        else:
            col = np.zeros(0, a_col.dtype)
        return ptr, col

    def pick(x, d):
        return x[d] if isinstance(x, (list, tuple)) else x

    kw = dict(min_width=min_width, area_cap=area_cap, dma_fill=dma_fill,
              vwords=vwords)
    plans = []
    for d in range(n_shards):
        ptr, col = shard_csr(d)
        plans.append(plan_buckets(ptr, col, b_ptr,
                                  b_starts=pick(b_starts, d),
                                  b_lens=pick(b_lens, d), **kw))
    stride = 1 + vwords
    fill_rb_cap = max(1, _FILL_WORDS_CAP // stride)
    forced: dict = {}
    for pl_ in plans:
        for c in pl_.classes:
            rb, nch, eb, fl = forced.get(c.W, (1, 1, 1, False))
            fl = fl or c.fill
            rb = max(rb, c.rb)
            if fl:
                # fill slabs are VMEM-resident: clamp the union rb to the
                # slab budget (a gather-only shard may have chosen a
                # bigger chunk under the larger area budget)
                rb = min(rb, max(1, fill_rb_cap // c.W))
            forced[c.W] = (rb, max(nch, c.nchunks), max(eb, c.eb), fl)
    # replan under the forced union; eb may still grow when the union rb
    # regroups rows, so iterate the union to a fixpoint (converges fast:
    # rb/nchunks are fixed after the first forced round, eb only grows)
    for _ in range(4):
        out = []
        for d in range(n_shards):
            ptr, col = shard_csr(d)
            out.append(plan_buckets(ptr, col, b_ptr,
                                    b_starts=pick(b_starts, d),
                                    b_lens=pick(b_lens, d),
                                    forced=forced, **kw))
        new_forced = {
            W: (forced[W][0],
                max(pl_.classes[i].nchunks for pl_ in out),
                max(pl_.classes[i].eb for pl_ in out),
                forced[W][3])
            for i, W in enumerate(sorted(forced))}
        if new_forced == forced:
            break
        forced = new_forced
    # pad the per-shard fill window descriptors to a union window count
    # (S differs per shard; zero rows are no-op grid steps, the same
    # padding quantize() already introduces per chunk)
    for i in range(len(out[0].classes)):
        if not out[0].classes[i].fill:
            continue
        S = max(p.classes[i].win_row.shape[1] for p in out)
        for p in out:
            c = p.classes[i]
            s0 = c.win_row.shape[1]
            if s0 < S:
                c.win_row = np.pad(c.win_row, ((0, 0), (0, S - s0),
                                               (0, 0)))
                c.runs = np.pad(c.runs, ((0, 0), (0, S - s0), (0, 0),
                                         (0, 0)))
    specs = {tuple(c.spec for c in pl_.classes) for pl_ in out}
    assert len(specs) == 1, "sharded plans must share one spec"
    return out


@functools.partial(jax.jit,
                   static_argnames=("specs", "m", "vdtype", "interpret",
                                    "df", "tail", "wk"))
def bucketed_main(class_arrays, a_val, b_col, b_val, pairs2d,
                  a_words, *,
                  specs: Tuple[Tuple[int, ...], ...], m: int,
                  vdtype=None, interpret: bool = False,
                  df: bool = False, tail: str = "off",
                  b_words=None, wk: int = 0):
    """Whole-matrix main program: every class, every chunk, one dispatch.

    Returns (crow_nnz int32[m], cptr int32[m+1], class_totals int64[K],
    slabs) where slabs[k] = (cols [n,rb,W], vals [n,rb,W], nnz [n,rb])
    left-packed per row.  ``pairs2d`` is the interleaved fill stream
    (None when no class uses the Mosaic expansion).

    ``df``: double-f32 value pipeline — ``a_val``/``b_val`` arrive as
    stacked [2, nnz] f32 Dekker splits, slab values come back as
    [n, 2, rb, W] (hi, lo) planes, and no f64 op runs on device.
    """
    crow = jnp.zeros((m + 1,), jnp.int32)
    slabs = []
    totals = []
    for (W, rb, nchunks, eb, hp, sp, fill, stride, wrows,
         out_rows, planar, grp, pre, pf, pf_spec), arrs in zip(
             specs, class_arrays):
        if fill:
            body = functools.partial(
                _chunk_fill, a_val=a_val, pairs2d=pairs2d, W=W, rb=rb,
                hold_passes=hp, seg_passes=sp, stride=stride,
                wrows=wrows, out_rows=out_rows,
                vdtype=vdtype or b_val.dtype, interpret=interpret,
                df=df, tail=tail, planar=planar)
        elif pf:
            body = functools.partial(
                _chunk_planned, a_val=a_val, b_col=b_col, b_val=b_val,
                a_words=a_words, W=W, rb=rb, seg_passes=sp, df=df,
                tail=tail, pf_spec=pf_spec, vdtype=vdtype)
        elif pre:
            body = functools.partial(
                _chunk_pre, a_val=a_val, b_col=b_col, b_val=b_val,
                W=W, rb=rb, seg_passes=sp, df=df, tail=tail,
                vdtype=vdtype)
        else:
            body = functools.partial(
                _chunk_esc, a_val=a_val, b_col=b_col, b_val=b_val,
                W=W, rb=rb, hold_passes=hp, seg_passes=sp, df=df,
                tail=tail, b_words=b_words, wk=wk, vdtype=vdtype,
                G=grp)
        rows_g = arrs[0]
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


@functools.partial(jax.jit, static_argnames=("m", "nnz_cap", "df"))
def bucketed_extract(slabs, slab_row_start, cptr, *, m: int, nnz_cap: int,
                     df: bool = False):
    """Gather the left-packed class slabs into one CSR (col, val) pair —
    gather-ONLY (output written contiguously; scatters measured ~4x slower
    than gathers on TPU are avoided entirely).

    ``slab_row_start`` int32[m]: flat offset of each row's slab in the
    concatenated class slabs; output position ``j`` of row ``r`` reads slab
    element ``slab_row_start[r] + (j - cptr[r])``.  Under ``df`` the slab
    values are [n, 2, rb, W] (hi, lo) planes; the two f32 gathers move the
    same bytes as one f64 gather and the combine to f64 happens once on
    the nnz-sized output.
    """
    src = _slab_src(slab_row_start, cptr, m, nnz_cap)
    j = jnp.arange(nnz_cap, dtype=jnp.int32)
    ok = j < cptr[m]
    area = sum(int(np.prod(oC.shape)) for oC, _, _ in slabs)
    src = jnp.clip(jnp.where(ok, src, 0), 0, area - 1)
    # per-plane takes: one single-word gather per plane (~1 ns/index,
    # scripts/micro_gather2.py).  Round 4's wide-record variant
    # (interleave + one 4-word slice gather) lost twice over on the
    # re-measured backend: the k-word slice costs more than k takes,
    # and the device-side [area, k] interleave materialises a
    # lane-padded layout.
    def flat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    ccol = jnp.where(ok, flat([oC.reshape(-1) for oC, _, _ in slabs])
                     [src], 0)
    if df:
        hi = flat([oV[:, 0].reshape(-1) for _, oV, _ in slabs])[src]
        lo = flat([oV[:, 1].reshape(-1) for _, oV, _ in slabs])[src]
        z = jnp.float32(0)
        cval = (jnp.where(ok, hi, z).astype(jnp.float64)
                + jnp.where(ok, lo, z).astype(jnp.float64))
        return ccol, cval
    flat_v = flat([oV.reshape(-1) for _, oV, _ in slabs])
    cval = jnp.where(ok, flat_v[src], jnp.zeros((), flat_v.dtype))
    return ccol, cval


def bucketed_extract_planned(slabs, ext_wblk, ext_rowsel, ext_lane,
                             ext_masks, *, spec, nnz_cap: int,
                             nnz_c: int, df: bool = False):
    """Planned extraction: the slab->CSR gather scheduled on the host
    and executed by the windowed-gather + static-route kernels
    (ops/planned.py) over output chunks — replaces three ~8 ns/index
    XLA takes per output nonzero."""
    from . import planned as pn
    m_e, nst_e, nch, CH, interp = spec
    bits = jax.lax.bitcast_convert_type

    def flat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    cols = flat([oC.reshape(-1) for oC, _, _ in slabs])
    if df:
        tabs = [cols,
                flat([bits(oV[:, 0].reshape(-1), jnp.int32)
                      for _, oV, _ in slabs]),
                flat([bits(oV[:, 1].reshape(-1), jnp.int32)
                      for _, oV, _ in slabs])]
    else:
        tabs = [cols,
                flat([bits(oV.reshape(-1).astype(jnp.float32),
                           jnp.int32) for _, oV, _ in slabs])]

    def one(wb, rs, ln, mk):
        g = pn.pgather(tabs, wb, rs, ln, interpret=interp)
        r = pn.proute(g, mk, nst_e, interpret=interp)
        return [x[:CH] for x in r]

    if nch == 1:
        outs = one(ext_wblk[0], ext_rowsel[0], ext_lane[0],
                   ext_masks[0])
        outs = [o[None] for o in outs]
    else:
        def step(carry, xs):
            return carry, one(*xs)
        _, outs = jax.lax.scan(
            step, None, (ext_wblk, ext_rowsel, ext_lane, ext_masks))
    ok = jnp.arange(nnz_cap, dtype=jnp.int32) < np.int32(nnz_c)
    ccol = jnp.where(ok, outs[0].reshape(-1)[:nnz_cap], 0)
    if df:
        z = jnp.float32(0)
        hi = bits(outs[1].reshape(-1)[:nnz_cap], jnp.float32)
        lo = bits(outs[2].reshape(-1)[:nnz_cap], jnp.float32)
        cval = (jnp.where(ok, hi, z).astype(jnp.float64)
                + jnp.where(ok, lo, z).astype(jnp.float64))
        return ccol, cval
    v = bits(outs[1].reshape(-1)[:nnz_cap], jnp.float32)
    return ccol, jnp.where(ok, v, jnp.float32(0))


def bucketed_extract_static(slabs, ext_src, *, nnz_c: int,
                            df: bool = False):
    """Warm extraction with host-precomputed slab sources: three takes
    (col, hi, lo) with a static validity bound — no crow scatter, no
    cptr cumsum, no _slab_src hold (attach_static_extract)."""
    def flat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    nnz_cap = ext_src.shape[0]
    ok = jnp.arange(nnz_cap, dtype=jnp.int32) < np.int32(nnz_c)
    take = functools.partial(
        jnp.take, indices=ext_src, axis=0, mode="clip")
    ccol = jnp.where(ok, take(flat([oC.reshape(-1)
                                    for oC, _, _ in slabs])), 0)
    if df:
        hi = take(flat([oV[:, 0].reshape(-1) for _, oV, _ in slabs]))
        lo = take(flat([oV[:, 1].reshape(-1) for _, oV, _ in slabs]))
        z = jnp.float32(0)
        cval = (jnp.where(ok, hi, z).astype(jnp.float64)
                + jnp.where(ok, lo, z).astype(jnp.float64))
        return ccol, cval
    flat_v = flat([oV.reshape(-1) for _, oV, _ in slabs])
    cval = jnp.where(ok, take(flat_v), jnp.zeros((), flat_v.dtype))
    return ccol, cval


def _slab_src(slab_row_start: jax.Array, cptr: jax.Array, m: int,
              nnz_cap: int) -> jax.Array:
    """Slab source index of every output position WITHOUT a per-element
    row lookup: within a row, src advances by 1, and at row starts it
    jumps by a known delta — so ``src = j + cumsum(deltas scattered at row
    starts)``, two vector passes instead of two gathers per element."""
    base = slab_row_start - cptr[:m]
    prev = jnp.concatenate([jnp.zeros((1,), base.dtype), base[:-1]])
    hold = jnp.cumsum(
        jnp.zeros((nnz_cap,), jnp.int32).at[cptr[:m]].add(
            base - prev, mode="drop"))
    return jnp.arange(nnz_cap, dtype=jnp.int32) + hold


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

def run_bucketed(plan: BucketPlan, a_val, b_col, b_val, pairs2d=None,
                 vdtype=None, interpret: bool = False,
                 df: bool = False, tail: str = "off",
                 b_words=None, wk: int = 0, a_words=None):
    """Dispatch the main program.  Returns (crow, cptr, totals, slabs)."""
    upload_plan(plan)
    specs = tuple(c.spec for c in plan.classes)
    if pairs2d is None:
        pairs2d = jnp.zeros((1, 128), jnp.int32)
    if a_words is None:
        a_words = jnp.zeros((2,), jnp.int32)
    return bucketed_main(plan.dev, a_val, b_col, b_val, pairs2d,
                         a_words,
                         specs=specs, m=plan.m_cap, vdtype=vdtype,
                         interpret=interpret, df=df, tail=tail,
                         b_words=b_words, wk=wk)


def needs_pairs(plan: BucketPlan) -> bool:
    return any(c.fill for c in plan.classes)


def needs_words(plan: BucketPlan) -> bool:
    """True when any class runs the XLA-gather frontend (wide-gather
    operand candidates)."""
    return any(not c.fill for c in plan.classes)


def pairs_wrows_max(plan: BucketPlan) -> int:
    return max((c.wrows for c in plan.classes if c.fill), default=0)


def plan_extract(plan: BucketPlan, crow: np.ndarray) -> None:
    """Build the Mosaic extraction plan from the first-run row counts:
    PLANAR (src, dst, len) word runs per nonempty C row — one run per
    transport plane (columns / value-word planes; interleaving on device
    would materialise a lane-padded [N, stride] layout), split at
    output-chunk and window caps, windowed like the expansion runs.
    Attached to ``plan.ext`` when the cost model beats the XLA gather
    extraction."""
    plan.ext = build_extract_plan(
        crow, plan.slab_row_start,
        area=sum(c.W * c.rb * c.nchunks for c in plan.classes),
        nplanes=1 + (2 if plan.vwords == 2 else 1),  # col + hi (+ lo)
        force=plan.dma_fill in ("on", "interpret"))


def attach_static_extract(plan: BucketPlan) -> None:
    """Host-evaluate the extraction operands from the learned per-row
    counts: ``src[j]`` (flat slab index of output j) and the full
    ``cptr``.  nnz(C) is structural — once ``crow_h`` is known these are
    plan constants, so the warm fused program drops the crow scatter,
    the cptr cumsum and the _slab_src hold (measured together ~10 ms on
    scircuit's 393K outputs) for two plan-resident arrays."""
    crow = plan.crow_h.astype(np.int64)
    cptr = np.concatenate([[0], np.cumsum(crow)])
    area = sum(c.W * c.rb * c.nchunks for c in plan.classes)
    src = np.arange(plan.nnz_cap, dtype=np.int64)
    row_of = np.repeat(np.arange(plan.m), crow)
    base = (plan.slab_row_start[: plan.m].astype(np.int64)
            - cptr[: plan.m])
    add = np.zeros(plan.nnz_cap, np.int64)
    add[: row_of.size] = base[row_of]
    plan.ext_src_h = np.clip(src + add, 0, max(0, area - 1)) \
        .astype(np.int32)
    full = np.full((plan.m_cap + 1,), cptr[-1], np.int64)
    full[: plan.m + 1] = cptr
    plan.cptr_h = full.astype(np.int32)
    plan.ext_static_dev = None
    plan.ext_pf = None
    plan.ext_pf_dev = None
    # planned extraction: schedule the slab->CSR gather through the
    # same windowed-gather + static-route kernels as the planned
    # frontend (the 3 XLA takes cost ~25 ns per output nonzero and
    # dominate the fused program once the main stage is planned)
    if any(c.pf for c in plan.classes) and plan.nnz_c:
        interp = any(c.pf_spec[4] for c in plan.classes if c.pf)
        from . import planned as pnm
        CH = _PF_CHUNK_CAP
        nch = max(1, -(-plan.nnz_cap // CH))
        scheds = []
        for i in range(nch):
            lo = i * CH
            hi = min(plan.nnz_c, lo + CH)
            srcs = (plan.ext_src_h[lo:hi].astype(np.int64)
                    if hi > lo else np.zeros(0, np.int64))
            scheds.append(pnm.plan_pgather(srcs, 0))
        Ge = max(s[0].shape[0] for s in scheds)
        m_e = pnm._pow2(max(Ge * 1024, CH, 1024))
        if m_e <= 4 * _PF_CHUNK_CAP:
            host = {k: [] for k in ("wblk", "rowsel", "lane", "masks")}
            nst_e = 0
            for i, (wb, rs, ln, pm) in enumerate(scheds):
                Gmax = m_e // 1024
                wb2 = np.zeros(Gmax, np.int32)
                wb2[: wb.shape[0]] = wb
                rs2 = np.zeros((Gmax * 8, 128), np.int32)
                rs2[: rs.shape[0]] = rs
                ln2 = np.zeros((Gmax * 8, 128), np.int32)
                ln2[: ln.shape[0]] = ln
                pm2 = np.full(Gmax * 1024, -1, np.int64)
                pm2[: pm.size] = pm
                live = pm2 >= 0
                dest = np.full(m_e, -1, np.int64)
                dest[np.flatnonzero(live)] = pm2[live]
                free = np.setdiff1d(np.arange(m_e, dtype=np.int64),
                                    pm2[live])
                dest[dest < 0] = free
                masks, nst_e = pnm.plan_route(dest, m_e)
                host["wblk"].append(wb2)
                host["rowsel"].append(rs2)
                host["lane"].append(ln2)
                host["masks"].append(masks)
            plan.ext_pf = {k: np.stack(v) for k, v in host.items()}
            plan.ext_pf_spec = (m_e, nst_e, nch, CH, interp)


def warm_plan_from_crow(plan: BucketPlan, crow: np.ndarray) -> None:
    """Warm a fresh plan from previously-learned per-row nnz(C) counts so
    the first call runs the fused one-dispatch program directly — no cold
    ``run_bucketed`` compile, no totals fetch.  ``crow`` must come from an
    identical (matrix, plan-config) pair; the per-class totals and the
    extraction plan are re-derived from it exactly as the first-run
    readback would (finish_bucketed).  Used by the benchmark harness to
    cut cold-process compile count in half — a full fused-program compile
    through the remote-compile tunnel costs ~70-80 s."""
    crow = np.asarray(crow).astype(np.int64)[: plan.m]
    caps = []
    for c in plan.classes:
        rows = c.rows_g[c.rows_g >= 0]
        total = int(crow[rows].sum()) if rows.size else 0
        caps.append(quantize(total) if total else 1)
    plan.class_caps = tuple(caps)
    plan.nnz_c = int(crow.sum())
    plan.nnz_cap = quantize(max(1, plan.nnz_c))
    plan.crow_h = crow.astype(np.int32)
    attach_static_extract(plan)
    fill_ok = (plan.dma_fill in ("auto", "on", "interpret")
               and plan.vwords in (1, 2)
               and (rf.on_tpu() or plan.dma_fill == "interpret"))
    if fill_ok and plan.nnz_c:
        plan_extract(plan, plan.crow_h)


def build_extract_plan(crow: np.ndarray, slab_row_start: np.ndarray,
                       *, area: int, nplanes: int,
                       force: bool) -> Optional[ExtractPlan]:
    """Engine-generic core of :func:`plan_extract`: any engine whose
    output lives in left-packed row slabs addressed by ``slab_row_start``
    (bucketed classes, masked classes, block-dense strips) can stream its
    CSR extraction through the same windowed-run kernel."""
    nnz_c = int(crow.sum())
    if nnz_c == 0:
        return None
    avg_slots = nnz_c / max(1, int((crow > 0).sum()))
    if not force and avg_slots < _FILL_MIN_SPAN_WORDS:
        return None
    area_pad = -(-area // 128) * 128
    nnz_cap = quantize(max(1, nnz_c))
    if (area_pad * nplanes + _FILL_BIAS_WORDS >= 2**31
            or nnz_cap * nplanes >= 2**31):
        return None                   # int32 word addressing would overflow
    # peak HBM while extracting = live slabs (12 B/slot f64) + the planar
    # word stream (4 B/word) + the chunked output; past ~11 GB keep the
    # XLA gather extraction (v5e has 15.75 GB and the main program's sort
    # buffers also linger)
    peak_bytes = (area * 12 + area * nplanes * 4
                  + nnz_cap * nplanes * 8)
    if peak_bytes > 11 * (1 << 30):
        return None
    rows = np.flatnonzero(crow > 0)
    cptr = np.concatenate([[0], np.cumsum(crow, dtype=np.int64)])
    src = slab_row_start[rows].astype(np.int64)
    dst = cptr[rows]
    ln = crow[rows].astype(np.int64)
    CAPS = _FILL_WORDS_CAP // nplanes       # output SLOTS per chunk
    wrows = 128
    # split runs at output-chunk boundaries, then bucket by chunk
    first = dst // CAPS
    last = (dst + ln - 1) // CAPS
    npieces = (last - first + 1)
    if npieces.max(initial=1) > 1:
        idx = np.repeat(np.arange(src.size), npieces)
        within = (np.arange(idx.size)
                  - np.repeat(np.cumsum(npieces) - npieces, npieces))
        cut = (first[idx] + within) * CAPS
        lo = np.maximum(dst[idx], cut)
        hi = np.minimum(dst[idx] + ln[idx], cut + CAPS)
        src = src[idx] + (lo - dst[idx])
        ln = hi - lo
        dst = lo
    cid = dst // CAPS
    nchunks = max(1, -(-nnz_cap // CAPS))
    wins, runss, s_total, r_total = [], [], 0, 0
    order = np.argsort(cid, kind="stable")
    src, dst, ln, cid = src[order], dst[order], ln[order], cid[order]
    bounds = np.searchsorted(cid, np.arange(nchunks + 1))
    for o in range(nchunks):
        sel = slice(bounds[o], bounds[o + 1])
        w, r = _group_runs(src[sel], dst[sel] - o * CAPS, ln[sel],
                           wrows, _FILL_EPG)
        wins.append(w)
        runss.append(r)
        s_total += w.shape[0]
        r_total += int(w[:, 1].sum())
    # one descriptor drives all planes: ~0.17 us of extra walk per extra
    # plane on top of the ~0.4 us first walk
    fill_est = (s_total * _FILL_STEP_US * 1e3
                + r_total * (_FILL_RUN_US + 0.17 * (nplanes - 1)) * 1e3
                + nnz_c * nplanes * 0.7)
    gather_est = nnz_c * (43.0 if nplanes == 3 else 29.0)
    if fill_est >= gather_est and not force:
        return None
    S = quantize(max(w.shape[0] for w in wins))
    win_row = np.zeros((nchunks, S, 2), np.int32)
    runs = np.zeros((nchunks, S, _FILL_EPG, 3), np.int32)
    for k, (w, r) in enumerate(zip(wins, runss)):
        win_row[k, :w.shape[0]] = w
        runs[k, :r.shape[0]] = r
    return ExtractPlan(nplanes=nplanes, nchunks=nchunks,
                       cap_slots=CAPS, wrows=wrows,
                       area_pad=area_pad, win_row=win_row, runs=runs)


def _dekker_words(oV):
    """f64 -> two f32 words (value == hi + lo within 2^-48 relative;
    f64 cannot be bitcast to words on this backend, so the split is
    arithmetic).  Returns (hi_i32, lo_i32, finite_flag)."""
    hi = oV.astype(jnp.float32)
    lo = (oV - hi.astype(jnp.float64)).astype(jnp.float32)
    ok = jnp.all(jnp.isfinite(hi))
    return (jax.lax.bitcast_convert_type(hi, jnp.int32),
            jax.lax.bitcast_convert_type(lo, jnp.int32), ok)


@functools.partial(jax.jit, static_argnames=("spec", "m", "nnz_cap",
                                             "interpret", "df"))
def bucketed_extract_mosaic(slabs, win_row, runs, slab_row_start, cptr,
                            *, spec, m: int, nnz_cap: int,
                            interpret: bool = False, df: bool = False):
    """Mosaic extraction: per-row packed slab spans stream into the CSR
    arrays via ragged_fill over output chunks (the windowed-copy answer
    to the gather-only XLA extraction's ~44 ns per output nonzero).
    Falls back to the XLA path at runtime if any value overflows the
    f32 transport range (lax.cond, f64 only).  Under ``df`` the slab
    values are already (hi, lo) word planes — the Dekker split (and its
    overflow risk) disappears."""
    nplanes, nchunks, cap_slots, wrows, area_pad = spec
    f64 = nplanes == 3
    cols, his, los = [], [], []
    ok = jnp.bool_(True)
    for oC, oV, _ in slabs:
        cols.append(oC.reshape(-1))
        if df:
            his.append(jax.lax.bitcast_convert_type(
                oV[:, 0].reshape(-1), jnp.int32))
            los.append(jax.lax.bitcast_convert_type(
                oV[:, 1].reshape(-1), jnp.int32))
        elif f64:
            hi, lo, fin = _dekker_words(oV.reshape(-1))
            ok = ok & fin
            his.append(hi)
            los.append(lo)
        else:
            his.append(jax.lax.bitcast_convert_type(
                oV.reshape(-1).astype(jnp.float32), jnp.int32))
    # PLANAR stream: [bias | col plane | hi plane | (lo plane)], each
    # plane padded to area_pad words so the kernel reaches plane p at a
    # fixed row stride — a device-side interleave would materialise a
    # lane-padded [N, stride] layout (128/stride x blowup)
    def plane(parts):
        p = jnp.concatenate(parts)
        return jnp.pad(p, (0, area_pad - p.shape[0]))
    stream = jnp.concatenate(
        [jnp.zeros((_FILL_BIAS_WORDS,), jnp.int32), plane(cols),
         plane(his)] + ([plane(los)] if f64 else []))
    srows = stream.shape[0] // 128 + wrows + rf.PAD_ROWS
    stream2d = jnp.zeros((srows, 128), jnp.int32).at[
        : stream.shape[0] // 128].set(stream.reshape(-1, 128))

    cap_rows = nplanes * cap_slots // 128

    def mosaic(_):
        kw = dict(out_rows=cap_rows, wrows=wrows, nplanes=nplanes,
                  src_stride_rows=area_pad // 128, dst_stride=cap_slots,
                  interpret=interpret)
        if nchunks == 1:
            w = rf.ragged_fill(win_row[0], runs[0], stream2d, **kw)
            ws = w[None, : cap_rows]
        else:
            def step(carry, xs):
                wr, rn = xs
                w = rf.ragged_fill(wr, rn, stream2d, **kw)
                return carry, w[: cap_rows]
            _, ws = jax.lax.scan(step, None, (win_row, runs))
        # ws [nchunks, nplanes*cap_slots/128, 128] -> per-plane streams
        wsp = ws.reshape(nchunks, nplanes, cap_slots)
        ccol = wsp[:, 0].reshape(-1)[:nnz_cap]
        hi = jax.lax.bitcast_convert_type(
            wsp[:, 1].reshape(-1)[:nnz_cap], jnp.float32)
        if f64:
            lo = jax.lax.bitcast_convert_type(
                wsp[:, 2].reshape(-1)[:nnz_cap], jnp.float32)
            cval = hi.astype(jnp.float64) + lo.astype(jnp.float64)
        else:
            cval = hi
        j = jnp.arange(nnz_cap, dtype=jnp.int32)
        good = j < cptr[m]
        return (jnp.where(good, ccol, 0),
                jnp.where(good, cval, jnp.zeros((), cval.dtype)))

    def xla(_):
        return bucketed_extract(slabs, slab_row_start, cptr, m=m,
                                nnz_cap=nnz_cap, df=df)

    if f64 and not df:
        # only the on-device Dekker split can overflow transport range;
        # under df the plan-time range guard already certified it
        return jax.lax.cond(ok, mosaic, xla, None)
    return mosaic(None)


@functools.partial(jax.jit, static_argnames=("specs", "m", "vdtype",
                                             "interpret", "nnz_cap",
                                             "ext_spec", "df", "tail",
                                             "wk", "nnz_c",
                                             "ext_pf_spec"))
def bucketed_fused(class_arrays, a_val, b_col, b_val, pairs2d,
                   slab_row_start, ext_win, ext_runs, a_words, *,
                   specs: Tuple[Tuple[int, ...], ...], m: int,
                   vdtype=None, interpret: bool = False,
                   nnz_cap: int = 1, ext_spec=None, df: bool = False,
                   tail: str = "off", b_words=None, wk: int = 0,
                   ext_static=None, nnz_c: int = 0,
                   ext_pf=None, ext_pf_spec=()):
    """Warm-path program: main stage + extraction traced as ONE dispatch.

    Once the first run's totals fetch has fixed ``nnz_cap`` (and the
    optional Mosaic extraction plan), nothing between the two programs
    needs the host — so the steady state becomes one dispatch + one
    fence instead of two dispatches + one fence.  On this environment's
    ~31 ms host<->device transport that saves a full round trip per
    iteration, which is the entire margin on small suite members
    (scircuit, mac_econ_fwd500 — VERDICT round 2 item 2; protocol
    ``/root/reference/src/main.cu:102-137``)."""
    crow, cptr, totals, slabs = bucketed_main(
        class_arrays, a_val, b_col, b_val, pairs2d, a_words,
        specs=specs, m=m, vdtype=vdtype, interpret=interpret, df=df,
        tail=tail, b_words=b_words, wk=wk)
    if ext_static is not None:
        # host-precomputed sources + cptr constant: the device-side
        # crow/cptr/slab_src computations above are dead code XLA prunes
        ext_src, cptr_const = ext_static
        if ext_pf is not None:
            ccol, cval = bucketed_extract_planned(
                slabs, *ext_pf, spec=ext_pf_spec,
                nnz_cap=ext_src.shape[0], nnz_c=nnz_c, df=df)
        else:
            ccol, cval = bucketed_extract_static(slabs, ext_src,
                                                 nnz_c=nnz_c, df=df)
        return cptr_const, ccol, cval
    if ext_spec is not None:
        ccol, cval = bucketed_extract_mosaic(
            slabs, ext_win, ext_runs, slab_row_start, cptr,
            spec=ext_spec, m=m, nnz_cap=nnz_cap, interpret=interpret,
            df=df)
    else:
        ccol, cval = bucketed_extract(slabs, slab_row_start, cptr,
                                      m=m, nnz_cap=nnz_cap, df=df)
    return cptr, ccol, cval


def run_bucketed_fused(plan: BucketPlan, a_val, b_col, b_val,
                       pairs2d=None, vdtype=None,
                       interpret: bool = False, df: bool = False,
                       tail: str = "off", b_words=None, wk: int = 0,
                       a_words=None):
    """Dispatch the fused warm-path program (requires a warm plan:
    ``plan.nnz_cap`` already learned).  Returns (cptr, ccol, cval)."""
    assert plan.nnz_cap is not None, "fused path needs a warm plan"
    upload_plan(plan)
    specs = tuple(c.spec for c in plan.classes)
    if pairs2d is None:
        pairs2d = jnp.zeros((1, 128), jnp.int32)
    if plan.ext is not None:
        e = plan.ext
        if e.dev is None:
            e.dev = (jnp.asarray(e.win_row), jnp.asarray(e.runs))
        ext_win, ext_runs = e.dev
        ext_spec = (e.nplanes, e.nchunks, e.cap_slots, e.wrows,
                    e.area_pad)
    else:
        ext_win = ext_runs = jnp.zeros((1,), jnp.int32)
        ext_spec = None
    ext_static = None
    ext_pf = None
    ext_pf_spec = ()
    if plan.ext is None and plan.ext_src_h is not None:
        if plan.ext_static_dev is None:
            plan.ext_static_dev = (jnp.asarray(plan.ext_src_h),
                                   jnp.asarray(plan.cptr_h))
        ext_static = plan.ext_static_dev
        if plan.ext_pf is not None:
            if plan.ext_pf_dev is None:
                plan.ext_pf_dev = tuple(
                    jnp.asarray(plan.ext_pf[k])
                    for k in ("wblk", "rowsel", "lane", "masks"))
            ext_pf = plan.ext_pf_dev
            ext_pf_spec = plan.ext_pf_spec
    if a_words is None:
        a_words = jnp.zeros((2,), jnp.int32)
    cptr, ccol, cval = bucketed_fused(
        plan.dev, a_val, b_col, b_val, pairs2d, plan.dev_slab_start,
        ext_win, ext_runs, a_words, specs=specs, m=plan.m_cap,
        vdtype=vdtype,
        interpret=interpret, nnz_cap=plan.nnz_cap, ext_spec=ext_spec,
        df=df, tail=tail, b_words=b_words, wk=wk,
        ext_static=ext_static, nnz_c=plan.nnz_c or 0,
        ext_pf=ext_pf, ext_pf_spec=ext_pf_spec)
    if vdtype is not None and jnp.dtype(vdtype) != cval.dtype:
        cval = cval.astype(vdtype)
    return cptr, ccol, cval


def finish_bucketed(plan: BucketPlan, main_out, vdtype, df: bool = False):
    """Dispatch the extraction program (needs plan.class_caps/nnz_cap —
    filled from the first run's single totals fetch; the same first-run
    readback also fetches the per-row counts that seed the Mosaic
    extraction plan when the cost model picks it)."""
    crow, cptr, totals, slabs = main_out
    if plan.class_caps is None:
        t = np.asarray(totals)                    # the one first-run sync
        plan.class_caps = tuple(quantize(int(x)) if x else 1 for x in t)
        plan.nnz_c = int(t.sum())
        plan.nnz_cap = quantize(max(1, plan.nnz_c))
        plan.crow_h = np.asarray(crow)[: plan.m].astype(np.int32)
        attach_static_extract(plan)
        fill_ok = (plan.dma_fill in ("auto", "on", "interpret")
                   and plan.vwords in (1, 2)
                   and (rf.on_tpu() or plan.dma_fill == "interpret"))
        if fill_ok and plan.nnz_c:
            plan_extract(plan, plan.crow_h)
    if plan.ext is not None:
        e = plan.ext
        if e.dev is None:
            e.dev = (jnp.asarray(e.win_row), jnp.asarray(e.runs))
        ccol, cval = bucketed_extract_mosaic(
            slabs, e.dev[0], e.dev[1], plan.dev_slab_start, cptr,
            spec=(e.nplanes, e.nchunks, e.cap_slots, e.wrows,
                  e.area_pad),
            m=plan.m_cap, nnz_cap=plan.nnz_cap,
            interpret=(plan.dma_fill == "interpret"), df=df)
        if jnp.dtype(vdtype) != cval.dtype:
            cval = cval.astype(vdtype)
        return cptr, ccol, cval
    ccol, cval = bucketed_extract(
        slabs, plan.dev_slab_start, cptr, m=plan.m_cap,
        nnz_cap=plan.nnz_cap, df=df)
    return cptr, ccol, cval
