"""Planned VMEM frontend: gather + routing as host-scheduled Mosaic
kernels.

The XLA gather floor on this chip is ~8 ns per index regardless of
locality (scripts/micro_gather3.py), which makes the per-slot takes
frontend the dominant cost of every short-span class (the reference's
tiny-row/pwarp regime, ``/root/reference/inc/numeric.cuh:66-214``).
Because the precomputed frontend's slot sources are **plan constants**
(ops/bucketed._attach_slot_arrays), all data movement can be scheduled
on the host and executed as dense vector work:

* ``pgather`` — windowed gather: slots are host-sorted by source and
  binned so each output row of 128 slots reads ONE 128-word table row,
  8 rows per aligned 1024-word window.  In-kernel per window: one
  dynamic [8,128] VMEM load, a masked-sum row select, and one
  lane-gather (``take_along_axis`` axis=1) per plane — measured
  ~1-1.5 ns/slot including schedule padding vs ~8 ns per XLA take.
* ``proute`` — static permutation: a bitonic network whose
  compare-exchange outcomes are **pre-simulated on the host** against
  the static destination keys and shipped as bit-packed masks; the
  kernel replays log2(M)*(log2(M)+1)/2 stages of roll + select with no
  comparisons.  Optionally finishes with a segmented hold (static
  run-start flags) that broadcasts routed run-head values down their
  runs — the A-operand propagate.

Plan-time code is vectorized numpy; masks and schedules are cached with
the plan.  Kernels run interpreted on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# Host: windowed gather schedule
# ---------------------------------------------------------------------------

def plan_pgather(src: np.ndarray, table_words: int):
    """Schedule a gather of ``src`` (any order, int64/32, all >= 0) as
    windowed two-step VREG gathers.

    Each scheduled output row reads from ONE aligned 8192-word
    superwindow (64 table rows); all 8 rows of a scheduled block share
    the same superwindow.  The kernel computes

        out[j, l] = win64[rowsel[j, lane[j, l]], lane[j, l]]

    so per output row, ``rowsel`` fixes a static lane -> window-row
    function (0..63, applied as 8 sublane-gathers over [8,128] slices
    + selects) and every output position picks a lane.  A slot with
    source (r, λ) can sit at ANY free position of an output row whose
    ``rowsel[λ] == r``; slots sharing a source word are free
    duplicates.  The scheduler ranks each lane's distinct window rows
    (ascending); a slot's logical row index is its lane rank, cloned
    when >128 slots share one rank.

    Returns (wblk int32[Gb], rowsel int32[Gb*8, 128],
    lane int32[Gb*8, 128], perm int64[Gb*1024]): ``wblk[g]`` is the
    superwindow (units of 64 table rows) for scheduled rows 8g..8g+7,
    ``perm[p]`` the index into ``src`` landing at scheduled position
    ``p`` (-1 pad).
    """
    S = src.size
    if S == 0:
        return (np.zeros(1, np.int32), np.zeros((8, 128), np.int32),
                np.zeros((8, 128), np.int32), np.full(1024, -1,
                                                      np.int64))
    order = np.argsort(src, kind="stable")
    ss = src[order].astype(np.int64)
    win = ss // 8192                      # aligned superwindow id
    wrow = (ss // 128) % 64               # window row 0..63
    lane = (ss % 128).astype(np.int64)
    # rank of each slot's (window, lane, wrow) among the DISTINCT wrows
    # of its (window, lane): sorted order makes ranks ascending runs
    key_wl = win * 128 + lane             # not sorted; sort by it
    o2 = np.argsort(key_wl, kind="stable")
    kw = key_wl[o2]
    wr = wrow[o2]
    new_group = np.concatenate([[True], kw[1:] != kw[:-1]])
    new_val = new_group | (wr != np.concatenate([[-1], wr[:-1]]))
    # per-(window, lane) rank of the slot's distinct window row:
    # (# distinct values so far in group) - 1
    val_cum = np.cumsum(new_val)
    start_of_group = np.maximum.accumulate(
        np.where(new_group, val_cum - 1, 0))
    rank = val_cum - 1 - start_of_group
    # logical row for each slot: (window, rank)
    lwin = win[o2]
    assert rank.max(initial=0) < 64    # <= 64 distinct rows per window
    lkey = lwin * 64 + rank
    # capacity split: >128 slots sharing (window, rank) clone the row
    o3 = np.argsort(lkey, kind="stable")
    lk = lkey[o3]
    first = np.searchsorted(lk, lk)       # index of first equal element
    pos_in = np.arange(lk.size) - first
    clone = pos_in // 128
    col = pos_in % 128
    # physical rows: unique (window, rank, clone)
    pkey = lk * 64 + np.minimum(clone, 63)
    assert clone.max(initial=0) < 64, "pathological clone count"
    pu, pinv = np.unique(pkey, return_inverse=True)
    nrows = pu.size
    row_win = pu // (64 * 64)
    # group physical rows into 8-row scheduled blocks per window
    wb_starts = np.flatnonzero(np.concatenate(
        [[True], row_win[1:] != row_win[:-1]]))
    wb_ends = np.concatenate([wb_starts[1:], [nrows]])
    wb_pieces = -(-(wb_ends - wb_starts) // 8)
    Gb = int(wb_pieces.sum())
    wblk = np.repeat(row_win[wb_starts], wb_pieces).astype(np.int32)
    sched_row = (np.repeat(
        np.cumsum(wb_pieces) - wb_pieces, wb_ends - wb_starts) * 8
        + np.arange(nrows)
        - np.repeat(wb_starts, wb_ends - wb_starts))
    # fill planes
    rowsel = np.zeros((Gb * 8, 128), np.int32)
    lanep = np.zeros((Gb * 8, 128), np.int32)
    perm = np.full(Gb * 1024, -1, np.int64)
    srow = sched_row[pinv]                # per slot (in o3 order)
    sl_lane = lane[o2][o3]
    sl_wrow = wr[o3]
    sl_orig = order[o2][o3]
    # rowsel: for each (physical row, lane) -> window row (consistent by
    # construction: same (window, lane, rank) => same wrow)
    rowsel[srow, sl_lane] = sl_wrow.astype(np.int32)
    lanep[srow, col] = sl_lane.astype(np.int32)
    perm[srow * 128 + col] = sl_orig
    return wblk, rowsel, lanep, perm


def _pgather_kernel(nplanes, wblk_ref, *refs):
    # trace the whole body with x64 promotion off: the package enables
    # jax_enable_x64 globally (f64 values), but Mosaic has no 64-bit
    # vregs — take_along_axis/fori_loop would otherwise promote indices
    tab_refs = refs[:nplanes]
    rowsel_ref = refs[nplanes]
    lane_ref = refs[nplanes + 1]
    out_refs = refs[nplanes + 2:]
    Gb = wblk_ref.shape[0]

    def body(g, _):
        rs = rowsel_ref[pl.ds(g * 8, 8), :]           # [8, 128], 0..63
        ln = lane_ref[pl.ds(g * 8, 8), :]
        base = wblk_ref[g] * 64
        rs_hi = jax.lax.shift_right_logical(rs, jnp.int32(3))
        rs_lo = rs & 7
        for p in range(nplanes):
            win = tab_refs[p][pl.ds(base, 64), :]     # [64, 128]
            # two-level per-lane window-row pick over the 64-row
            # superwindow (sublane gathers reach 8 rows), then the
            # per-position lane pick:
            # out[j, l] = win[rowsel[j, ln[j,l]], ln[j,l]]
            B = jnp.zeros((8, 128), jnp.int32)
            for k in range(8):
                Bk = jnp.take_along_axis(win[k * 8:(k + 1) * 8],
                                         rs_lo, axis=0)
                B = B + jnp.where(rs_hi == k, Bk, 0)
            out_refs[p][pl.ds(g * 8, 8), :] = jnp.take_along_axis(
                B, ln, axis=1)
        return 0

    with jax.enable_x64(False):
        jax.lax.fori_loop(0, Gb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pgather(tabs: Sequence[jax.Array], wblk: jax.Array,
            rowsel: jax.Array, lane: jax.Array,
            interpret: bool = False):
    """Windowed gather of ``len(tabs)`` i32 planes.  ``tabs[p]`` is the
    flat table plane (padded so every window read is in bounds);
    ``wblk``/``rowsel``/``lane`` from :func:`plan_pgather`.  Returns
    i32 planes of shape [Gb*1024] in scheduled order."""
    nplanes = len(tabs)
    Gb = wblk.shape[0]
    tab2d = []
    for t in tabs:
        n = t.shape[0]
        rows = (-(-n // 8192)) * 64 + 64   # whole superwindows + slack
        t = jnp.concatenate([t, jnp.zeros((rows * 128 - n,), jnp.int32)])
        tab2d.append(t.reshape(rows, 128))
    kernel = functools.partial(_pgather_kernel, nplanes)
    with jax.enable_x64(False):
        outs = _pgather_call(kernel, nplanes, Gb, wblk, tab2d, rowsel,
                             lane, interpret)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return [o.reshape(-1) for o in outs]


def _pgather_call(kernel, nplanes, Gb, wblk, tab2d, rowsel, lane,
                  interpret):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(nplanes + 2)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                       for _ in range(nplanes)],
        ),
        out_shape=[jax.ShapeDtypeStruct((Gb * 8, 128), jnp.int32)
                   for _ in range(nplanes)],
        interpret=interpret,
    )(wblk, *tab2d, rowsel, lane)


# ---------------------------------------------------------------------------
# Host: static routing masks (simulated bitonic)
# ---------------------------------------------------------------------------

def _stage_list(m: int):
    """Bitonic stage (k, j) pairs for width ``m`` (pow2)."""
    out = []
    k = 2
    while k <= m:
        j = k >> 1
        while j >= 1:
            out.append((k, j))
            j >>= 1
        k <<= 1
    return out


def plan_route(dest: np.ndarray, m: int):
    """Simulate a bitonic sort of the static keys ``dest`` (int64[m],
    distinct) and record each stage's take-mask, bit-packed into int32
    planes.  The kernel replaying these masks applies the permutation
    ``out[dest[i]] = in[i]``.  Returns (masks int32[nwords, m],
    nstages)."""
    assert m & (m - 1) == 0 and dest.size == m
    key = dest.astype(np.int64).copy()
    stages = _stage_list(m)
    nwords = (len(stages) + 31) // 32
    masks = np.zeros((nwords, m), np.uint32)
    idx = np.arange(m, dtype=np.int64)
    for s, (k, j) in enumerate(stages):
        pk = key[idx ^ j]
        if k < m:
            asc = (idx & k) == 0
        else:
            asc = np.ones(m, bool)
        want_min = ((idx & j) == 0) == asc
        take = np.where(want_min, pk < key, pk > key)
        masks[s >> 5] |= take.astype(np.uint32) << np.uint32(s & 31)
        key = np.where(take, pk, key)
    assert np.array_equal(key, np.sort(dest)), "routing simulation bug"
    return masks.view(np.int32), len(stages)


def _pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def build_chunk_schedules(slot_src: np.ndarray, slot_aidx: np.ndarray,
                          W: int):
    """Host schedules for one class chunk of the planned frontend.

    ``slot_src``/``slot_aidx`` int32[L] (-1 pad source): the precomputed
    per-slot expansion (ops/bucketed._attach_slot_arrays).  Returns a
    dict of numpy arrays: B gather schedule + routing masks back to
    slot order, A run-head gather schedule + routing masks + head
    flags.  All arrays are per-chunk; the caller pads/stacks across
    chunks."""
    L = slot_src.size
    valid = slot_src >= 0
    pos = np.flatnonzero(valid)

    def sched_and_route(srcs, dst_pos):
        wblk, rel, perm = plan_pgather(srcs.astype(np.int64), 0)
        SB = perm.size
        m = _pow2(max(SB, L, 1024))
        live = perm >= 0
        dest = np.full(m, -1, np.int64)
        dest[np.flatnonzero(live)] = dst_pos[perm[live]]
        free = np.setdiff1d(np.arange(m, dtype=np.int64),
                            dst_pos[perm[live]], assume_unique=False)
        dest[dest < 0] = free
        masks, nst = plan_route(dest, m)
        return wblk, rel, masks, m, nst

    bg_wblk, bg_rel, bt_masks, m_b, nst_b = sched_and_route(
        slot_src[pos], pos)

    # A runs: head at each slot starting a new (entry) run
    head = valid.copy()
    cont = np.zeros(L, bool)
    cont[1:] = (valid[1:] & valid[:-1]
                & (slot_aidx[1:] == slot_aidx[:-1])
                & (slot_src[1:] == slot_src[:-1] + 1))
    cont[np.arange(L) % W == 0] = False
    head &= ~cont
    hpos = np.flatnonzero(head)
    ag_wblk, ag_rel, at_masks, m_a, nst_a = sched_and_route(
        slot_aidx[hpos], hpos)
    flags = np.zeros(m_a, np.int32)
    flags[hpos] = 1
    return dict(bg_wblk=bg_wblk, bg_rel=bg_rel, bt_masks=bt_masks,
                m_b=m_b, nst_b=nst_b,
                ag_wblk=ag_wblk, ag_rel=ag_rel, at_masks=at_masks,
                m_a=m_a, nst_a=nst_a, flags=flags)


def _partner_flat(x, d: int):
    """Value at flat index ``f ^ d`` for [R, 128] planes (flat index
    f = r*128 + lane)."""
    if d < 128:
        up = pltpu.roll(x, np.int32(128 - d), axis=1)   # lane l+d
        dn = pltpu.roll(x, np.int32(d), axis=1)         # lane l-d
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & np.int32(d)) == 0, up, dn)
    rd = d >> 7
    up = pltpu.roll(x, np.int32(x.shape[0] - rd), axis=0)
    dn = pltpu.roll(x, np.int32(rd), axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & np.int32(rd)) == 0, up, dn)


def _shift_to_seg(x, s: int, w2: int, fill):
    """Value at flat index ``f - s`` within aligned ``w2`` segments
    (s pow2 <= w2/2), ``fill`` where f mod w2 < s."""
    shape = x.shape
    if s < 128:
        a = pltpu.roll(x, np.int32(s), axis=1)
        b = pltpu.roll(a, np.int32(1), axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        sh = jnp.where(lane < np.int32(s), b, a)
    else:
        sh = pltpu.roll(x, np.int32(s >> 7), axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if w2 <= 128:
        fmod = lane & np.int32(w2 - 1)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        fmod = ((row & np.int32((w2 >> 7) - 1)) << 7) + lane
    return jnp.where(fmod >= np.int32(s), sh, fill)


def _proute_kernel(nplanes, stages, hold_w2, mask_ref, flag_ref, *refs):
    with jax.enable_x64(False):
        _proute_body(nplanes, stages, hold_w2, mask_ref, flag_ref,
                     *refs)


def _proute_body(nplanes, stages, hold_w2, mask_ref, flag_ref, *refs):
    in_refs = refs[:nplanes]
    out_refs = refs[nplanes:]
    planes = [r[...] for r in in_refs]
    rows = planes[0].shape[0]
    for s, (k, j) in enumerate(stages):
        # take-mask for stage s: bit (s & 31) of mask word row s // 32
        w = s // 32
        take = jax.lax.shift_right_logical(
            mask_ref[w * rows:(w + 1) * rows, :], np.int32(s & 31)) & 1
        planes = [jnp.where(take != 0, _partner_flat(p, j), p)
                  for p in planes]
    if hold_w2 > 1:
        # segmented hold: broadcast run-head values down their runs
        # (static run-start flags; slots before any head keep zeros)
        f = flag_ref[...]
        d = 1
        while d < hold_w2:
            sf = _shift_to_seg(f, d, hold_w2, jnp.int32(1))
            stop = f != 0
            for i in range(nplanes):
                sh = _shift_to_seg(planes[i], d, hold_w2, jnp.int32(0))
                planes[i] = jnp.where(stop, planes[i], sh)
            f = f | sf
            d <<= 1
    for i in range(nplanes):
        out_refs[i][...] = planes[i]


@functools.partial(jax.jit,
                   static_argnames=("nstages", "hold_w2", "interpret"))
def proute(planes: Sequence[jax.Array], masks: jax.Array,
           nstages: int, hold_w2: int = 1,
           flags: Optional[jax.Array] = None,
           interpret: bool = False):
    """Apply the pre-simulated routing network to flat i32 planes of
    length m (pow2, multiple of 1024).  ``masks`` int32[nwords, m] from
    :func:`plan_route`.  ``hold_w2`` > 1 additionally propagates routed
    run-head values down runs within aligned ``hold_w2`` segments
    (``flags`` i32[m]: 1 at run heads)."""
    m = planes[0].shape[0]
    nplanes = len(planes)
    stages = tuple(_stage_list(m))
    assert len(stages) == nstages
    rows = m // 128

    def plane2d(x):
        return x.reshape(rows, 128)

    if flags is None:
        flags = jnp.ones((m,), jnp.int32)
    kernel = functools.partial(_proute_kernel, nplanes, stages, hold_w2)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(nplanes + 2)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                       for _ in range(nplanes)],
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)
                       for _ in range(nplanes)],
            interpret=interpret,
        )(masks.reshape(-1, 128), plane2d(flags),
          *[plane2d(p) for p in planes])
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return [o.reshape(-1) for o in outs]
