"""Mosaic ESC tail: sort-by-column + segmented accumulate + left-pack in
VMEM — the fused hot loop the reference runs in shared memory
(``/root/reference/inc/numeric.cuh:215-297``: hash accumulate, table
compaction, in-table sort), rebuilt as a TPU vector-unit kernel.

Round-2 measurement (scripts/profile_tail.py, cant f64, W=3072 class):
the Mosaic ragged fill delivers the product slab at ~0.94 ns/slot, but
the XLA tail costs ~8.6 ns/slot on top — stride-3 deinterleave
(~1.5 ns), i32→f64 bitcast (~2.3), emulated-f64 product (~2.3), sorts +
scans with f64 payload (~2.7).  Everything expensive is a consequence
of emulated f64 and HBM-hopping between XLA ops.  This kernel removes
all of it:

* values never become f64 on device: they travel and accumulate as
  **double-f32 (hi, lo) pairs** (Dekker split host-side, two-sum
  compensated adds in-kernel; representation error ≤ ~2^-48 relative,
  accumulation error ~K·2^-47 — bounded at plan time against the 1e-9
  comparator tolerance by a value-range guard, ``df_range_ok``);
* the batched in-row sort is a **bitonic network over aligned
  pow2-width segments** expressed as lane/sublane rolls + selects (the
  XOR-partner exchange never crosses an aligned segment boundary, so
  every per-row sort in the block runs in the same vector pass);
* the duplicate-column accumulate is a segment-flagged Hillis-Steele
  scan (the ``atomicAdd`` analogue), the left-pack a second bitonic
  pass keyed by the dense duplicate-free ranks.

All phases execute in one ``pallas_call`` per chunk, blocked over the
slab with the standard auto-pipelined grid; the only XLA work left in
the fill path is the A-value broadcast, the double-f32 product, and the
final per-row nnz count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = np.int32(2**31 - 1)

# Slots per grid step (per-plane VMEM block = _BLKS * 4 B; with 4 input
# + 3 output planes double-buffered plus ~8 live temporaries this peaks
# ~5-6 MB of the ~16 MB VMEM).
_BLKS = 1 << 16


def supported_w2(w: int) -> bool:
    """Fused-tail feasibility for a class of (pow2) slot width ``w``.
    The lane-segmented network handles any pow2 >= 2 (a width-2 sort is
    one compare-exchange); tiny widths matter for road-network-like
    suites where most rows have 2-4 products."""
    return 2 <= w <= _BLKS and (w & (w - 1)) == 0


def _fmod(shape, w2: int):
    """``f mod w2`` of every slot (flat index f = row*128 + lane)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    if w2 <= 128:
        return lane & np.int32(w2 - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return ((row & np.int32((w2 >> 7) - 1)) << 7) + lane


def _shift_to(x, s: int, w2: int, fill):
    """Value at flat index ``f - s`` (s a power of two ≤ w2/2), ``fill``
    where ``f mod w2 < s`` (the shift never crosses a segment)."""
    shape = x.shape
    if s < 128:
        a = pltpu.roll(x, np.int32(s), axis=1)               # lane l-s (mod 128)
        b = pltpu.roll(a, np.int32(1), axis=0)               # row r-1 of that
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        sh = jnp.where(lane < np.int32(s), b, a)
    else:
        sh = pltpu.roll(x, np.int32(s >> 7), axis=0)
    return jnp.where(_fmod(shape, w2) >= np.int32(s), sh, fill)


def _shift_back1(x, w2: int, fill):
    """Value at flat index ``f + 1``; ``fill`` where ``f`` is the last
    slot of its segment."""
    shape = x.shape
    a = pltpu.roll(x, np.int32(127), axis=1)                 # lane l+1 (mod 128)
    b = pltpu.roll(a, np.int32(shape[0] - 1), axis=0)        # row r+1 of that
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    sh = jnp.where(lane == np.int32(127), b, a)
    return jnp.where(_fmod(shape, w2) == np.int32(w2 - 1), fill, sh)


def _partner(x, d: int):
    """Value at flat index ``f ^ d`` (d a power of two < segment width;
    XOR stays inside the aligned segment, so no masking is needed)."""
    if d < 128:
        up = pltpu.roll(x, np.int32(128 - d), axis=1)        # lane l+d
        dn = pltpu.roll(x, np.int32(d), axis=1)              # lane l-d
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & np.int32(d)) == 0, up, dn)
    rd = d >> 7
    up = pltpu.roll(x, np.int32(x.shape[0] - rd), axis=0)
    dn = pltpu.roll(x, np.int32(rd), axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & np.int32(rd)) == 0, up, dn)


def _flat_bit(shape, d: int):
    """i32 0/1: bit ``d`` (a power of two) of the flat index.  Kept as
    int32 — combining BOOL vectors with logical_xor/not lowers to an
    i8->i1 truncation Mosaic rejects ("Unsupported target bitwidth for
    truncation"); integer xor + one final comparison lowers clean."""
    if d < 128:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return jax.lax.shift_right_logical(
            lane & np.int32(d), np.int32(d.bit_length() - 1))
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    rd = d >> 7
    return jax.lax.shift_right_logical(
        row & np.int32(rd), np.int32(rd.bit_length() - 1))


def _flat_bit0(shape, d: int):
    """Bool: bit ``d`` (a power of two) of the flat index is zero."""
    return _flat_bit(shape, d) == 0


def _bitonic(key, payload, w2: int):
    """Sort each aligned ``w2``-wide segment ascending by ``key``,
    moving the ``payload`` planes along.  Ties keep both sides in place
    (strict comparisons at both ends of each exchange)."""
    shape = key.shape
    k = 2
    while k <= w2:
        ascb = _flat_bit(shape, k) if k < w2 else None  # k == w2: all asc
        j = k >> 1
        while j >= 1:
            pk = _partner(key, j)
            # want the segment minimum on this side iff bit_j == bit_k
            # (int32 xor + one comparison: bool xor/not does not lower,
            # see _flat_bit; likewise a select BETWEEN two bool vectors
            # hits the same i8->i1 truncation, so select i32 0/1 flags
            # and compare once)
            want_min = _flat_bit0(shape, j) if ascb is None else \
                (_flat_bit(shape, j) ^ ascb) == 0
            lt = (pk < key).astype(jnp.int32)
            gt = (pk > key).astype(jnp.int32)
            take = jnp.where(want_min, lt, gt) != 0
            key = jnp.where(take, pk, key)
            payload = tuple(
                jnp.where(take, _partner(p, j), p) for p in payload)
            j >>= 1
        k <<= 1
    return key, payload


def _df_add(ah, al, bh, bl):
    """Double-f32 compensated add (two-sum based): (ah, al) + (bh, bl),
    result normalised so hi = f32(hi + lo)."""
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    e = e + (al + bl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _seg_sum(vh, vl, new_i, w2: int, f64: bool):
    """Segmented inclusive sum over runs flagged by ``new_i`` (i32 0/1
    run starts), within aligned ``w2`` segments."""
    f = new_i
    one = jnp.int32(1)
    d = 1
    while d < w2:
        sh = _shift_to(vh, d, w2, jnp.float32(0))
        sf = _shift_to(f, d, w2, one)
        stop = f != 0
        if f64:
            sl = _shift_to(vl, d, w2, jnp.float32(0))
            nh, nl = _df_add(vh, vl, sh, sl)
            vh = jnp.where(stop, vh, nh)
            vl = jnp.where(stop, vl, nl)
        else:
            vh = jnp.where(stop, vh, vh + sh)
        f = f | sf
        d <<= 1
    return vh, vl


def _cumsum_seg(x, w2: int):
    """Inclusive cumsum of i32 within aligned ``w2`` segments."""
    d = 1
    while d < w2:
        x = x + _shift_to(x, d, w2, jnp.int32(0))
        d <<= 1
    return x


def _tail_kernel(w2: int, f64: bool, kref, href, lref, rlref, *orefs):
    K = kref[...]
    H = pltpu.bitcast(href[...], jnp.float32)
    L = pltpu.bitcast(lref[...], jnp.float32) if f64 else None
    shape = K.shape

    if rlref is not None:
        # mask invalid slots (slot-in-row >= row products): key -> +inf
        K = jnp.where(_fmod(shape, w2) < rlref[...], K, _I32_MAX)

    # ---- sort by column ------------------------------------------------
    K, pay = _bitonic(K, (H, L) if f64 else (H,), w2)
    H = pay[0]
    if f64:
        L = pay[1]

    # ---- duplicate-column accumulate (the atomicAdd analogue) ----------
    prev = _shift_to(K, 1, w2, _I32_MAX - np.int32(1))
    new_i = (K != prev).astype(jnp.int32)
    H, L = _seg_sum(H, L, new_i, w2, f64)

    # ---- ends, dense ranks, left-pack ----------------------------------
    nn = _shift_back1(new_i, w2, jnp.int32(1))
    ends = (nn != 0) & (K < _I32_MAX)
    rank = _cumsum_seg(ends.astype(jnp.int32), w2) - 1
    key2 = jnp.where(ends, rank, _I32_MAX)
    key2, pay2 = _bitonic(key2, (K, H, L) if f64 else (K, H), w2)
    orefs[0][...] = jnp.where(key2 < _I32_MAX, pay2[0], _I32_MAX)
    orefs[1][...] = pltpu.bitcast(pay2[1], jnp.int32)
    if f64:
        orefs[2][...] = pltpu.bitcast(pay2[2], jnp.int32)


@functools.partial(jax.jit, static_argnames=("w2", "f64", "interpret"))
def esc_tail_flat(keys, vhi, vlo, *, w2: int, f64: bool,
                  interpret: bool = False):
    """Fused sort + accumulate + pack over FLAT pre-masked slot planes.

    Same kernel as :func:`esc_tail`, but the operands arrive as flat
    1-D ``[slots]`` planes (``slots`` a multiple of ``w2``; invalid
    slots already carry key 2^31-1) — the layout the precomputed
    frontend produces.  Nothing is ever materialised as ``[rows, W]``:
    for W ≪ 128 that layout lane-pads 128/W× in HBM, which round-5
    profiling measured as the dominant cost of the small-width classes.
    Returns flat (packed_cols, packed_hi_bits, packed_lo_bits|None).
    """
    slots = keys.shape[0]
    assert slots % w2 == 0 and supported_w2(w2), (slots, w2)
    blks = min(_BLKS, max(1024, 1 << (slots - 1).bit_length()))
    nblocks = -(-slots // blks)
    pad = nblocks * blks - slots
    br = blks // 128

    def plane(x, fill=0):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, jnp.int32)])
        return x.reshape(-1, 128)

    kernel = functools.partial(_tail_kernel, w2, f64)

    def kernel3(kref, href, lref, *orefs):
        return kernel(kref, href, lref, None, *orefs)

    spec = pl.BlockSpec((br, 128), lambda t: (t, np.int32(0)))
    nouts = 3 if f64 else 2
    outs = pl.pallas_call(
        kernel3,
        grid=(nblocks,),
        in_specs=[spec, spec, spec],
        out_specs=[spec] * nouts,
        out_shape=[jax.ShapeDtypeStruct((nblocks * br, 128), jnp.int32)
                   for _ in range(nouts)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(plane(keys, fill=int(_I32_MAX)), plane(vhi),
      plane(vlo) if f64 else plane(vhi))

    ok = outs[0].reshape(-1)[:slots]
    oh = outs[1].reshape(-1)[:slots]
    ol = outs[2].reshape(-1)[:slots] if f64 else None
    return ok, oh, ol


@functools.partial(jax.jit, static_argnames=("w2", "f64", "interpret"))
def esc_tail(keys, vhi, vlo, row_len, *, w2: int, f64: bool,
             interpret: bool = False):
    """Fused sort + accumulate + pack over ``[rows, w2]`` slabs.

    ``keys`` i32[rows, w2] (garbage beyond ``row_len`` — masked
    in-kernel), ``vhi``/``vlo`` f32-bits-as-i32 [rows, w2] product
    planes (``vlo`` ignored when ``f64=False``), ``row_len``
    i32[rows].  Returns (packed_cols i32 [rows, w2] with 2^31-1 beyond
    each row's output nnz, packed_hi, packed_lo(None for f32)) — each
    row's surviving (column, value) pairs left-packed in ascending
    column order, duplicate columns summed.
    """
    rows, w = keys.shape
    assert w == w2 and supported_w2(w2), (rows, w2)
    slots = rows * w2
    blks = min(_BLKS, max(1024, 1 << (slots - 1).bit_length()))
    nblocks = -(-slots // blks)
    pad = nblocks * blks - slots
    br = blks // 128

    def plane(x):
        flat = x.reshape(-1)
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
        return flat.reshape(-1, 128)

    rl = jnp.broadcast_to(row_len.astype(jnp.int32)[:, None],
                          (rows, w2))
    kernel = functools.partial(_tail_kernel, w2, f64)
    spec = pl.BlockSpec((br, 128), lambda t: (t, np.int32(0)))
    nouts = 3 if f64 else 2
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec] * nouts,
        out_shape=[jax.ShapeDtypeStruct((nblocks * br, 128), jnp.int32)
                   for _ in range(nouts)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(plane(keys), plane(vhi),
      plane(vlo) if f64 else plane(vhi), plane(rl))

    def unplane(x):
        return x.reshape(-1)[:slots].reshape(rows, w2)

    ok, oh = unplane(outs[0]), unplane(outs[1])
    ol = unplane(outs[2]) if f64 else None
    return ok, oh, ol


# ---------------------------------------------------------------------------
# Host-side double-f32 helpers (XLA ops, used by the glue in bucketed.py)
# ---------------------------------------------------------------------------

def dekker_split_np(v: np.ndarray):
    """Exact f64 -> (hi, lo) f32 split on host: hi = f32(v), lo =
    f32(v - hi).  |v - (hi + lo)| <= ~2^-48 |v| for in-range values."""
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_mul_xla(ah, al, bh, bl):
    """Double-f32 product (Veltkamp-split two-product — no FMA exposed
    through jnp): returns normalised (hi, lo), error ~2^-47 relative."""
    C = jnp.float32(4097.0)                    # 2^12 + 1
    ca = C * ah
    a1 = ca - (ca - ah)
    a2 = ah - a1
    cb = C * bh
    b1 = cb - (cb - bh)
    b2 = bh - b1
    p = ah * bh
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    e = e + (ah * bl + al * bh)
    hi = p + e
    lo = e - (hi - p)
    return hi, lo


def df_range_ok(a_val: np.ndarray, b_val: np.ndarray, wmax: int) -> bool:
    """Plan-time guard: every operand, every product and every in-row
    partial sum must stay far inside f32 range for the double-f32
    pipeline to hold its error bound (overflow would produce inf;
    subnormal underflow only costs absolute error ~1e-38, far under the
    1e-9-absolute arm of the comparator, CSR.equals)."""
    if a_val.size == 0 or b_val.size == 0:
        return True
    ma = float(np.max(np.abs(a_val)))
    mb = float(np.max(np.abs(b_val)))
    if not (np.isfinite(ma) and np.isfinite(mb)):
        return False
    # each operand must survive its own Dekker split (hi = f32(v))
    if ma >= 1e30 or mb >= 1e30:
        return False
    return ma * mb * max(1, wmax) < 1e30


# public aliases for the XLA-side glue (ops/bucketed.py)
df_add_xla = _df_add
