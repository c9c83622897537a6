"""Distributed SpGEMM: row-partitioned C = A @ B over a device mesh.

New capability relative to the single-GPU reference (SURVEY.md §2.3): A and
C are row-partitioned over the 1-D ``rows`` mesh axis; B is replicated,
row-sharded + ``all_gather``-ed, or — the halo-exchange analogue —
row-sharded with each shard fetching ONLY the B rows its local A references
through one host-planned ``all_to_all`` (``b_strategy='ragged'``).  Each
shard runs the fused expand-sort-compress pipeline on its row block under
``shard_map`` — shapes are capacity-padded to the max over shards so one
fixed-shape program serves every device, then the host trims.

Everything here also runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) which is how the tests and the
driver's multi-chip dry-run exercise N-way sharding without N chips.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_CONFIG, SpGEMMConfig
from ..csr import CSR
from ..errors import ShapeMismatchError, SpGEMMError, require
from ..ops import bucketed as bucketed_ops
from ..ops import esc_tail as esc_tail_ops
from ..ops import remote_fetch
from ..ops.expand import expand_products_sl
from ..ops.scan import compact, exclusive_cumsum, rows_reduce_int, seg_scan
from ..ops.shapes import quantize
from ..ops.symbolic import _run_starts2
from .mesh import ROWS


def _put(x: np.ndarray, sharding) -> jax.Array:
    """device_put that also works when the sharding spans processes
    (multi-host mesh): every process holds the full host array, so the
    global array is assembled from per-shard slices of it."""
    if all(d.process_index == jax.process_index()
           for d in sharding.device_set):
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def _to_np(x) -> np.ndarray:
    """Fetch a (possibly non-fully-addressable) array to host numpy."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


@dataclasses.dataclass
class RowPartition:
    """Host-side padded row partition of a CSR matrix: shard d owns rows
    [bounds[d], bounds[d+1]) (default: equal-row split); arrays are
    padded to the max per-shard row/nnz counts so every shard sees one
    static shape."""

    n_shards: int
    rows_per_shard: int        # row capacity R = max shard row count
    nnz_cap: int
    ptr: np.ndarray    # int32[D, R+1] local (0-based) row pointers
    col: np.ndarray    # int32[D, cap]
    val: np.ndarray    # float[D, cap]
    nnz: np.ndarray    # int32[D] true local nnz
    bounds: np.ndarray = None  # int64[D+1] owned global row ranges


def balance_bounds(A: CSR, B: CSR, n_shards: int) -> np.ndarray:
    """Work-balanced row bounds: split A's rows so every shard owns
    ~equal INTERMEDIATE PRODUCTS (sum of referenced B-row lengths), not
    equal rows.  Equal-row splits pad every shard's forced-union class
    plan to the heaviest shard's shapes (VERDICT round-2 weak #4 — one
    skewed shard cost all eight its padding); equal-intprod splits make
    the union tight.  Returns int64[D+1] with bounds[0]=0, bounds[D]=M,
    monotone (empty shards allowed when < D heavy rows exist)."""
    blens = np.diff(B.ptr).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(blens[A.col])])
    p_cum = cs[A.ptr]                       # intprod prefix per row bound
    total = int(p_cum[-1])
    targets = (np.arange(1, n_shards, dtype=np.int64)
               * total) // n_shards
    inner = np.searchsorted(p_cum[1:-1], targets, side="left")
    bounds = np.concatenate([[0], inner, [A.M]]).astype(np.int64)
    return np.maximum.accumulate(bounds)


def partition_rows(A: CSR, n_shards: int, value_dtype=None,
                   bounds: Optional[np.ndarray] = None) -> RowPartition:
    """``bounds`` (int[D+1], default equal-row split): shard d owns rows
    [bounds[d], bounds[d+1]); every shard's arrays are padded to the max
    shard's row/nnz counts so one static shape serves the mesh."""
    if bounds is None:
        R0 = -(-A.M // n_shards)
        # trailing shards can own ZERO rows when (D-1)*ceil(M/D) >= M
        # (e.g. M=9, D=8): clamp, never index A.ptr past M
        bounds = np.minimum(np.arange(n_shards + 1, dtype=np.int64) * R0,
                            A.M)
    R = max(1, int(np.max(np.diff(bounds))))
    caps = [int(A.ptr[bounds[d + 1]] - A.ptr[bounds[d]])
            for d in range(n_shards)]
    cap = max(1, max(caps))
    ptr = np.zeros((n_shards, R + 1), dtype=np.int32)
    col = np.zeros((n_shards, cap), dtype=np.int32)
    val = np.zeros((n_shards, cap), dtype=value_dtype or A.val.dtype)
    nnz = np.zeros((n_shards,), dtype=np.int32)
    for d in range(n_shards):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        if hi <= lo:
            continue                       # empty shard: all-zero block
        base = A.ptr[lo]
        local = A.ptr[lo:hi + 1] - base
        ptr[d, :hi - lo + 1] = local
        ptr[d, hi - lo + 1:] = local[-1]
        k = int(local[-1])
        col[d, :k] = A.col[base:base + k]
        val[d, :k] = A.val[base:base + k]
        nnz[d] = k
    return RowPartition(n_shards=n_shards, rows_per_shard=R, nnz_cap=cap,
                        ptr=ptr, col=col, val=val, nnz=nnz,
                        bounds=np.asarray(bounds, dtype=np.int64))


def _shard_esc_kernel(a_ptr, a_col, a_val, a_nnz, b_lens_g, b_starts_g,
                      b_col_flat, b_val_flat, *, rows_local: int,
                      nnz_a_cap: int, total: int, max_group: int):
    """Per-shard fused ESC SpGEMM on the local row block.

    ``b_lens_g``/``b_starts_g`` describe every *global* B row as a segment
    of ``b_col_flat``/``b_val_flat`` (which may be a concatenation of
    gathered per-shard blocks, hence starts instead of a CSR ptr)."""
    a_ptr = a_ptr.reshape(-1)
    a_col = a_col.reshape(-1)
    a_val = a_val.reshape(-1)
    a_nnz = a_nnz.reshape(())

    ps = expand_products_sl(a_ptr, a_col, b_starts_g[a_col],
                            b_lens_g[a_col], total, nnz_a_cap,
                            a_nnz_valid=a_nnz)
    c = b_col_flat[ps.src]
    crow = jnp.where(ps.valid, ps.crow, jnp.int32(rows_local))
    orig = jnp.arange(total, dtype=jnp.int32)
    s_row, s_col, s_orig = jax.lax.sort((crow, c, orig), num_keys=2)

    v = a_val[ps.a_idx[s_orig]] * b_val_flat[ps.src[s_orig]]
    v = jnp.where(s_row < rows_local, v, jnp.zeros((), v.dtype))

    new = _run_starts2(s_row, s_col)
    vsum = seg_scan(jnp.add, new, v, max_group)
    is_end = (jnp.concatenate([new[1:], jnp.ones((1,), bool)])
              & (s_row < rows_local))

    # per-local-row nnz: products of row i occupy a contiguous sorted span;
    # span sizes = per-row product counts
    lens_masked = jnp.where(
        jnp.arange(nnz_a_cap, dtype=jnp.int32) < a_nnz, b_lens_g[a_col], 0)
    p_row = rows_reduce_int(lens_masked, a_ptr)
    p_ex = exclusive_cumsum(p_row, dtype=jnp.int32)
    crow_nnz = rows_reduce_int(is_end.astype(jnp.int32), p_ex)

    col_cap = compact(s_col, is_end, total)
    val_cap = compact(vsum, is_end, total)
    nnz_total = jnp.sum(is_end.astype(jnp.int32))
    return (crow_nnz[None], col_cap[None], val_cap[None],
            nnz_total.reshape(1))


def _stack_plans(plans, shard, grid=None):
    """Stack per-shard class descriptor arrays for shard_map transport.
    Per-class names mirror upload_plan's tuples: fill classes carry
    (row_len, win_row, runs) instead of ent_src.  ``grid=(Dr, Dc)``
    reshapes the shard dim for a 2-D mesh (plans listed r-major)."""
    cls_names = [
        ("rows_g", "ent_dst", "ent_len", "ent_aidx", "row_len",
         "win_row", "runs") if c.fill else
        ("rows_g", "ent_dst", "ent_src", "ent_len", "ent_aidx")
        for c in plans[0].classes]

    def _g(a):
        return a.reshape(grid + a.shape[1:]) if grid else a

    flat = [_put(_g(np.stack([getattr(p.classes[i], name)
                              for p in plans])), shard)
            for i, names in enumerate(cls_names) for name in names]
    return flat, [len(n) for n in cls_names]


def _unstack_counts(fl, counts):
    out, k = [], 0
    for n in counts:
        out.append(tuple(fl[k + j][0] for j in range(n)))
        k += n
    return out


def _shard_bucketed_kernel(class_arrays, a_val, slab_start,
                           b_col_flat, b_val_flat, pairs2d,
                           *, specs, m_cap: int, nnz_cap: int,
                           rows_local: int, interpret: bool = False,
                           df: bool = False):
    """Per-shard BUCKETED SpGEMM on the local row block (the production
    single-chip engine under shard_map — replaces the flat ESC kernel
    as the distributed compute path, VERDICT round-1 item 3).

    The descriptor arrays were host-planned per shard against the
    layout of ``b_col_flat``/``b_val_flat`` (replicated CSR, gathered
    blocks, or ragged halo payload) with IDENTICAL class specs across
    shards, so this one program serves every device.  ``pairs2d`` is
    the interleaved Mosaic-fill transport stream in the same address
    space (built on device AFTER the collective for the gathered /
    halo layouts — bucketed_ops.pairs_device).

    ``df``: f64 values ride the double-f32 pipeline end to end — A and
    B values arrive as stacked (hi, lo) f32 Dekker planes (so the
    collectives move two f32 planes, the same bytes as one f64), no
    emulated-f64 op runs on device, and the extraction recombines to
    f64 once on the nnz-sized output (see config.SpGEMMConfig.df32)."""
    a_val = a_val.reshape(2, -1) if df else a_val.reshape(-1)
    b_val = b_val_flat.reshape(2, -1) if df else b_val_flat.reshape(-1)
    if pairs2d is None:
        pairs2d = jnp.zeros((1, 128), jnp.int32)
    crow, cptr, totals, slabs = bucketed_ops.bucketed_main(
        class_arrays, a_val, b_col_flat.reshape(-1),
        b_val, pairs2d, jnp.zeros((2,), jnp.int32), specs=specs,
        m=m_cap, interpret=interpret, df=df)
    ccol, cval = bucketed_ops.bucketed_extract(
        slabs, slab_start.reshape(-1), cptr, m=m_cap, nnz_cap=nnz_cap,
        df=df)
    nnz_tot = cptr[m_cap]
    return (crow[:rows_local][None], ccol[None], cval[None],
            nnz_tot.reshape(1))


@dataclasses.dataclass
class RaggedFetchPlan:
    """Host-planned static exchange: which B rows each shard sends where.

    The halo-exchange analogue for SpGEMM: shard d needs exactly the B
    rows named by its local A columns — a static property of the sparsity
    pattern — so the exchange is ONE ``all_to_all`` on host-precomputed
    index arrays, with traffic proportional to the needed rows instead of
    all of B (the SP/CP analogue named in SURVEY.md §2.3)."""

    r_cap: int                 # max rows any (src, dst) pair exchanges
    v_cap: int                 # max nonzeros any (src, dst) pair exchanges
    n_cap: int                 # max distinct needed rows per shard
    send_src: np.ndarray       # int32[D, D, v_cap] idx into local b arrays
    recv_start: np.ndarray     # int32[D, n_cap] start in recv payload
    recv_len: np.ndarray       # int32[D, n_cap]
    a_col_remap: np.ndarray    # int32[D, a_cap] local A cols -> needed idx


def plan_ragged_fetch(A: CSR, B: CSR, apart: RowPartition,
                      bpart: RowPartition) -> RaggedFetchPlan:
    D = bpart.n_shards

    def b_owner(rows):
        """Owning B shard of each global row (bounds-aware: the A/C
        partition may be work-balanced, partition_rows(bounds=...))."""
        return np.searchsorted(bpart.bounds[1:], rows, side="right")

    needed = []            # per dst shard: sorted unique needed global rows
    for d in range(D):
        lo, hi = int(apart.bounds[d]), int(apart.bounds[d + 1])
        cols = A.col[A.ptr[lo]:A.ptr[hi]] if hi > lo else \
            np.zeros(0, np.int32)
        needed.append(np.unique(cols).astype(np.int64))
    blens = np.diff(B.ptr).astype(np.int64)

    # v_cap counts REMOTE pairs only: a shard's own rows are read straight
    # from its local block, so the exchange carries just the halo
    r_cap = v_cap = n_cap = 1
    for d in range(D):
        n_cap = max(n_cap, needed[d].size)
        src = b_owner(needed[d])
        for s in range(D):
            if s == d:
                continue
            rows = needed[d][src == s]
            r_cap = max(r_cap, rows.size)
            v_cap = max(v_cap, int(blens[rows].sum()) if rows.size else 0)
    r_cap, v_cap, n_cap = quantize(r_cap), quantize(v_cap), quantize(n_cap)

    bcap = bpart.nnz_cap
    a_cap = apart.col.shape[1]
    send_src = np.zeros((D, D, v_cap), dtype=np.int32)
    recv_start = np.zeros((D, n_cap), dtype=np.int32)
    recv_len = np.zeros((D, n_cap), dtype=np.int32)
    a_col_remap = np.zeros((D, a_cap), dtype=np.int32)
    for d in range(D):
        nd = needed[d]
        src = b_owner(nd)
        for s in range(D):
            sel = np.flatnonzero(src == s)
            rows = nd[sel]
            if rows.size == 0:
                continue   # nothing owned by s is needed (or s is empty)
            lens = blens[rows]
            recv_len[d, sel] = lens.astype(np.int32)
            s_base = B.ptr[int(bpart.bounds[s])]
            if s == d:
                # local rows: direct offsets into the local padded block
                recv_start[d, sel] = (B.ptr[rows] - s_base).astype(
                    np.int32)
                continue
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]]) \
                if rows.size else np.zeros(0, np.int64)
            if rows.size:
                local_start = (B.ptr[rows] - s_base).astype(np.int64)
                total = int(lens.sum())
                flat = np.repeat(local_start - offs, lens) + np.arange(
                    total, dtype=np.int64)
                send_src[s, d, :total] = flat.astype(np.int32)
            recv_start[d, sel] = (bcap + src[sel] * v_cap + offs
                                  ).astype(np.int32)
        # remap local A cols to needed-row indices
        lo, hi = int(apart.bounds[d]), int(apart.bounds[d + 1])
        if hi > lo:
            k = int(A.ptr[hi] - A.ptr[lo])
            cols = A.col[A.ptr[lo]:A.ptr[lo] + k].astype(np.int64)
            a_col_remap[d, :k] = np.searchsorted(nd, cols).astype(np.int32)
    return RaggedFetchPlan(r_cap=r_cap, v_cap=v_cap, n_cap=n_cap,
                           send_src=send_src, recv_start=recv_start,
                           recv_len=recv_len, a_col_remap=a_col_remap)


def spgemm_dist(A: CSR, B: Optional[CSR], mesh: Mesh,
                config: SpGEMMConfig = DEFAULT_CONFIG,
                b_strategy: str = "allgather",
                state: Optional[dict] = None,
                engine: str = "bucketed") -> CSR:
    """Distributed C = A @ B (B=None -> B=A, or A^T under config.aat).

    ``b_strategy``:
      * ``"replicate"`` — B broadcast to every shard (no collectives).
      * ``"allgather"`` — B row-sharded; shards reassemble it with
        ``jax.lax.all_gather`` over the ``rows`` axis (ICI/DCN traffic
        proportional to nnz(B), overlapped by XLA with the expansion).
      * ``"ragged"`` — B row-sharded; each shard fetches ONLY the rows its
        local A references via one host-planned ``all_to_all`` (traffic
        proportional to the needed halo; degrades gracefully to allgather
        volume when every shard needs every row).
      * ``"grid2d"`` — 2-D (rows x cols) mesh: B block-partitioned
        (column-sliced over ``cols``, row-sharded over ``rows``), each
        shard materialises its column block with one rows-axis
        ``all_gather`` inside its cols group — per-device traffic
        ~nnz(B)/Dc vs the 1-D allgather's nnz(B).  Requires a mesh made
        by :func:`..parallel.mesh.make_grid_mesh`.

    ``engine``: ``"bucketed"`` (default) runs the production single-chip
    engine per shard — per-shard class plans forced to one shared spec so
    every device compiles the same program; ``"esc"`` keeps the flat
    expand-sort-compress kernel (robust fallback / differential check).
    A shard whose padded plan would overflow int32 falls back to
    row-chunked execution (each chunk re-partitioned over the mesh).
    """
    if B is None:
        B = A.transpose() if (config.aat and not A.is_symmetric) else A
    require(A.N == B.M, ShapeMismatchError, "A.N must equal B.M")
    D = mesh.devices.size
    vdtype = config.vdtype

    if state is not None and state.get("fn") is not None:
        # warm state: skip planning and H2D, dispatch the cached program
        crow_nnz, col_cap, val_cap, nnz_tot = state["fn"](*state["args"])
        if state.get("grid"):
            Dr, Dc = state["grid"]
            return _assemble2d(A, B, Dr, Dc, state["R"], state["total"],
                               crow_nnz, col_cap, val_cap, nnz_tot,
                               state["bounds"])
        return _assemble(A, B, D, state["R"], state["total"],
                         crow_nnz, col_cap, val_cap, nnz_tot,
                         bounds=state.get("bounds"))

    if engine == "bucketed":
        try:
            if b_strategy == "grid2d":
                return _spgemm_dist_grid2d(A, B, mesh, config, state)
            if b_strategy == "ragged_overlap":
                return _spgemm_dist_ragged_overlap(A, B, mesh, config,
                                                   state)
            return _spgemm_dist_bucketed(A, B, mesh, config, b_strategy,
                                         state)
        except ValueError:
            # a shard's padded slab overflowed int32: split into row
            # chunks, each chunk re-partitioned over the whole mesh
            return _dist_chunked(A, B, mesh, config, b_strategy)
    require(engine == "esc", SpGEMMError, f"unknown engine {engine!r}")

    part = partition_rows(A, D, value_dtype=vdtype)
    R = part.rows_per_shard

    # per-shard intermediate-product capacity (max over shards)
    blens = np.diff(B.ptr).astype(np.int64)
    per_nnz = blens[A.col]
    caps = []
    for d in range(D):
        lo, hi = min(d * R, A.M), min((d + 1) * R, A.M)
        caps.append(int(per_nnz[A.ptr[lo]:A.ptr[hi]].sum())
                    if hi > lo else 0)
    total = max(1, max(caps))
    require(total < 2**31, SpGEMMError,
            "per-shard product stream exceeds int32")
    a_row_nnz = np.diff(A.ptr)
    max_group = max(1, int(a_row_nnz.max()) if a_row_nnz.size else 1)

    shard = NamedSharding(mesh, P(ROWS))
    repl = NamedSharding(mesh, P())

    a_ptr = _put(part.ptr, shard)
    a_col = _put(part.col, shard)
    a_val = _put(part.val, shard)
    a_nnz = _put(part.nnz, shard)

    if b_strategy == "replicate":
        b_ptr = _put(B.ptr.astype(np.int32), repl)
        b_col = _put(B.col.astype(np.int32), repl)
        b_val = _put(B.val.astype(vdtype), repl)

        def wrapped(a_ptr, a_col, a_val, a_nnz, b_ptr, b_col, b_val):
            return _shard_esc_kernel(
                a_ptr, a_col, a_val, a_nnz,
                b_ptr[1:] - b_ptr[:-1], b_ptr[:-1], b_col, b_val,
                rows_local=R, nnz_a_cap=part.nnz_cap, total=total,
                max_group=max_group)

        fn = jax.jit(jax.shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(ROWS), P(ROWS), P(ROWS), P(ROWS), P(), P(), P()),
            out_specs=(P(ROWS), P(ROWS), P(ROWS), P(ROWS))))
        args = (a_ptr, a_col, a_val, a_nnz, b_ptr, b_col, b_val)
        crow_nnz, col_cap, val_cap, nnz_tot = fn(*args)
    elif b_strategy == "allgather":
        bpart = partition_rows(B, D, value_dtype=vdtype)
        RB, bcap = bpart.rows_per_shard, bpart.nnz_cap
        b_ptr_l = _put(bpart.ptr, shard)
        b_col_l = _put(bpart.col, shard)
        b_val_l = _put(bpart.val, shard)

        def wrapped(a_ptr, a_col, a_val, a_nnz, b_ptr_l, b_col_l, b_val_l):
            # reassemble B from every shard's block over ICI
            bp = jax.lax.all_gather(b_ptr_l[0], ROWS)     # [D, RB+1]
            bc = jax.lax.all_gather(b_col_l[0], ROWS)     # [D, bcap]
            bv = jax.lax.all_gather(b_val_l[0], ROWS)
            lens = (bp[:, 1:] - bp[:, :-1]).reshape(-1)   # [D*RB]
            starts = (bp[:, :-1] +
                      (jnp.arange(D, dtype=jnp.int32) * bcap)[:, None]
                      ).reshape(-1)
            lens = lens[:B.M]
            starts = starts[:B.M]
            return _shard_esc_kernel(
                a_ptr, a_col, a_val, a_nnz, lens, starts,
                bc.reshape(-1), bv.reshape(-1),
                rows_local=R, nnz_a_cap=part.nnz_cap, total=total,
                max_group=max_group)

        fn = jax.jit(jax.shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(ROWS),) * 7,
            out_specs=(P(ROWS), P(ROWS), P(ROWS), P(ROWS))))
        args = (a_ptr, a_col, a_val, a_nnz, b_ptr_l, b_col_l, b_val_l)
        crow_nnz, col_cap, val_cap, nnz_tot = fn(*args)
    elif b_strategy == "ragged":
        bpart = partition_rows(B, D, value_dtype=vdtype)
        fp = plan_ragged_fetch(A, B, part, bpart)
        b_col_l = _put(bpart.col, shard)
        b_val_l = _put(bpart.val, shard)
        send_src = _put(fp.send_src, shard)       # [D][D, v_cap]
        recv_start = _put(fp.recv_start, shard)   # [D][n_cap]
        recv_len = _put(fp.recv_len, shard)
        a_remap = _put(
            fp.a_col_remap.reshape(D, part.nnz_cap), shard)

        def wrapped(a_ptr, a_col, a_val, a_nnz, b_col_l, b_val_l,
                    send_src, recv_start, recv_len, a_remap):
            # pack per-destination payloads (host-planned indices), then
            # ONE all_to_all moves every (src, dst) block over ICI/DCN
            pc = b_col_l[0][send_src[0]]                    # [D, v_cap]
            pv = b_val_l[0][send_src[0]]
            rc = jax.lax.all_to_all(pc, ROWS, split_axis=0, concat_axis=0)
            rv = jax.lax.all_to_all(pv, ROWS, split_axis=0, concat_axis=0)
            # payload address space: [local block | halo from each shard]
            rc = jnp.concatenate([b_col_l[0], rc.reshape(-1)])
            rv = jnp.concatenate([b_val_l[0], rv.reshape(-1)])
            return _shard_esc_kernel(
                a_ptr, a_remap[0], a_val, a_nnz,
                recv_len[0], recv_start[0], rc, rv,
                rows_local=R, nnz_a_cap=part.nnz_cap, total=total,
                max_group=max_group)

        fn = jax.jit(jax.shard_map(
            wrapped, mesh=mesh,
            in_specs=(P(ROWS),) * 10,
            out_specs=(P(ROWS), P(ROWS), P(ROWS), P(ROWS))))
        args = (a_ptr, a_col, a_val, a_nnz, b_col_l, b_val_l,
                send_src, recv_start, recv_len, a_remap)
        crow_nnz, col_cap, val_cap, nnz_tot = fn(*args)
    else:
        raise SpGEMMError(f"unknown b_strategy {b_strategy!r}")

    if state is not None:
        state.update(fn=fn, args=args, R=R, total=total)
    return _assemble(A, B, D, R, total, crow_nnz, col_cap, val_cap,
                     nnz_tot)


def _spgemm_dist_bucketed(A: CSR, B: CSR, mesh: Mesh,
                          config: SpGEMMConfig, b_strategy: str,
                          state: Optional[dict]) -> CSR:
    """Bucketed engine over the mesh: per-shard class plans (one shared
    spec), B replicated / gathered / ragged-fetched, per-shard main +
    extraction in ONE shard_map program."""
    D = mesh.devices.size
    vdtype = config.vdtype
    # work-balanced partition: equal intermediate products per shard,
    # so the forced-union class spec is tight instead of padded to one
    # heavy shard's shapes (VERDICT round-2 item 7)
    bounds = balance_bounds(A, B, D)
    part = partition_rows(A, D, value_dtype=vdtype, bounds=bounds)
    R = part.rows_per_shard
    blens = np.diff(B.ptr).astype(np.int64)
    per_nnz = blens[A.col]
    caps = []
    for d in range(D):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        caps.append(int(per_nnz[A.ptr[lo]:A.ptr[hi]].sum())
                    if hi > lo else 0)
    total = quantize(max(1, max(caps)))        # nnz(C_shard) upper bound
    require(total < 2**31, SpGEMMError,
            "per-shard product stream exceeds int32")

    shard = NamedSharding(mesh, P(ROWS))
    repl = NamedSharding(mesh, P())
    vwords = 2 if np.dtype(vdtype) == np.float64 else 1
    # double-f32 pipeline for f64 (config.df32, cf. single-chip
    # spgemm_bucketed): values cross the collectives as (hi, lo) f32
    # planes and no emulated-f64 op runs on any shard.  Guarded at plan
    # time by the value-range bound; 2*p_max bounds any class width.
    p_row_max = int(np.max(np.diff(np.concatenate(
        [[0], np.cumsum(per_nnz)])[A.ptr]), initial=0))
    use_df = (vwords == 2 and config.df32 != "off"
              and (config.df32 == "on" or esc_tail_ops.df_range_ok(
                  A.val, B.val, 2 * max(1, p_row_max))))
    dma_fill = config.dma_fill
    if vwords == 2 and not use_df:
        # no raw-f64 word encode exists on device (f64 bitcasts do not
        # lower on this backend): without df the fill frontend is off
        dma_fill = "off"
    interpret = config.dma_fill == "interpret"
    if use_df:
        hi, lo = esc_tail_ops.dekker_split_np(
            part.val.astype(np.float64))
        a_val = _put(np.stack([hi, lo], axis=1), shard)   # [D, 2, cap]
    else:
        a_val = _put(part.val, shard)

    if b_strategy == "replicate":
        plans = bucketed_ops.plan_buckets_sharded(
            A.ptr, A.col, D, R, b_ptr=B.ptr,
            min_width=config.min_bucket_width,
            area_cap=config.bucket_area_cap,
            dma_fill=dma_fill, vwords=vwords, bounds=bounds)
    elif b_strategy == "allgather":
        bpart = partition_rows(B, D, value_dtype=vdtype)
        RB, bcap = bpart.rows_per_shard, bpart.nnz_cap
        own = np.arange(B.M) // RB
        starts_g = (own * bcap + (B.ptr[:-1] - B.ptr[own * RB])
                    ).astype(np.int64)
        plans = bucketed_ops.plan_buckets_sharded(
            A.ptr, A.col, D, R, b_starts=starts_g, b_lens=blens,
            min_width=config.min_bucket_width,
            area_cap=config.bucket_area_cap,
            dma_fill=dma_fill, vwords=vwords, bounds=bounds)
    elif b_strategy == "ragged":
        bpart = partition_rows(B, D, value_dtype=vdtype)
        fp = plan_ragged_fetch(A, B, part, bpart)
        a_cols = [fp.a_col_remap[d][: int(part.nnz[d])] for d in range(D)]
        plans = bucketed_ops.plan_buckets_sharded(
            A.ptr, A.col, D, R,
            b_starts=[fp.recv_start[d].astype(np.int64) for d in range(D)],
            b_lens=[fp.recv_len[d].astype(np.int64) for d in range(D)],
            a_col_shards=a_cols, min_width=config.min_bucket_width,
            area_cap=config.bucket_area_cap,
            dma_fill=dma_fill, vwords=vwords, bounds=bounds)
    else:
        raise SpGEMMError(f"unknown b_strategy {b_strategy!r}")

    specs = tuple(c.spec for c in plans[0].classes)
    m_cap = plans[0].m_cap
    use_fill = bucketed_ops.needs_pairs(plans[0])
    wrows_max = bucketed_ops.pairs_wrows_max(plans[0])
    flat, counts = _stack_plans(plans, shard)
    slab_start = _put(
        np.stack([p.slab_row_start for p in plans]), shard)

    def unstack(fl):
        return _unstack_counts(fl, counts)

    kern = functools.partial(_shard_bucketed_kernel, specs=specs,
                             m_cap=m_cap, nnz_cap=total, rows_local=R,
                             interpret=interpret, df=use_df)

    def split_vals(v2d):
        """Per-shard B value blocks as [D, 2, cap] Dekker planes."""
        hi, lo = esc_tail_ops.dekker_split_np(v2d.astype(np.float64))
        return np.stack([hi, lo], axis=1)

    if b_strategy == "replicate":
        b_col = _put(B.col.astype(np.int32), repl)
        b_val = _put(np.stack(esc_tail_ops.dekker_split_np(
            B.val.astype(np.float64))) if use_df
            else B.val.astype(vdtype), repl)
        # replicated B: the pairs stream is shard-independent, build it
        # once on host exactly like the single-chip path
        pairs = _put(bucketed_ops.build_pairs(
            B.col, B.val.astype(vdtype), vwords, wrows_max, df=use_df)
            if use_fill else np.zeros((1, 128), np.int32), repl)

        def wrapped(a_val, slab_start, b_col, b_val, pairs, *fl):
            return kern(unstack(fl), a_val, slab_start[0], b_col, b_val,
                        pairs)

        in_specs = (P(ROWS), P(ROWS), P(), P(), P()) \
            + (P(ROWS),) * len(flat)
        args = (a_val, slab_start, b_col, b_val, pairs, *flat)
    elif b_strategy == "allgather":
        b_col_l = _put(bpart.col, shard)
        b_val_l = _put(split_vals(bpart.val) if use_df else bpart.val,
                       shard)

        def wrapped(a_val, slab_start, b_col_l, b_val_l, *fl):
            bc = jax.lax.all_gather(b_col_l[0], ROWS).reshape(-1)
            bvg = jax.lax.all_gather(b_val_l[0], ROWS)   # [D,(2,)cap]
            bv = jnp.moveaxis(bvg, 0, 1).reshape(2, -1) if use_df \
                else bvg.reshape(-1)
            # re-encode the gathered payload into the fill transport
            # stream ON DEVICE (B travelled compact over the collective)
            pairs = bucketed_ops.pairs_device(
                bc, bv, vwords, wrows_max, df=use_df) \
                if use_fill else None
            return kern(unstack(fl), a_val, slab_start[0], bc, bv,
                        pairs)

        in_specs = (P(ROWS),) * 4 + (P(ROWS),) * len(flat)
        args = (a_val, slab_start, b_col_l, b_val_l, *flat)
    else:                                       # ragged
        b_col_l = _put(bpart.col, shard)
        b_val_l = _put(split_vals(bpart.val) if use_df else bpart.val,
                       shard)
        send_src = _put(fp.send_src, shard)

        pallas_comm = (config.comm_backend == "pallas"
                       and (use_df or vwords == 1))

        def wrapped(a_val, slab_start, b_col_l, b_val_l, send_src, *fl):
            pc = b_col_l[0][send_src[0]]
            if pallas_comm:
                # explicit double-buffered RDMA exchange: one direct
                # remote copy per destination, columns + value word
                # planes packed into a single transfer
                f32 = jnp.float32
                if use_df:
                    vplanes = (b_val_l[0][0][send_src[0]],
                               b_val_l[0][1][send_src[0]])
                else:
                    vplanes = (b_val_l[0][send_src[0]].astype(f32),)
                words = [pc] + [jax.lax.bitcast_convert_type(v, jnp.int32)
                                for v in vplanes]
                recv = remote_fetch.exchange_planes(
                    words, axis=ROWS, n_devices=D, interpret=interpret)
                rc, rvw = recv[0], recv[1:]
                bc = jnp.concatenate([b_col_l[0], rc.reshape(-1)])
                rvp = [jax.lax.bitcast_convert_type(w, f32) for w in rvw]
                if use_df:
                    bv = jnp.concatenate(
                        [b_val_l[0],
                         jnp.stack([v.reshape(-1) for v in rvp])],
                        axis=1)
                else:
                    bv = jnp.concatenate(
                        [b_val_l[0],
                         rvp[0].reshape(-1).astype(b_val_l.dtype)])
            else:
                rc = jax.lax.all_to_all(pc, ROWS, split_axis=0,
                                        concat_axis=0)
                bc = jnp.concatenate([b_col_l[0], rc.reshape(-1)])
                if use_df:
                    pv = b_val_l[0][:, send_src[0]]      # [2, D, v_cap]
                    rv = jax.lax.all_to_all(pv, ROWS, split_axis=1,
                                            concat_axis=1)
                    bv = jnp.concatenate(
                        [b_val_l[0], rv.reshape(2, -1)], axis=1)
                else:
                    pv = b_val_l[0][send_src[0]]
                    rv = jax.lax.all_to_all(pv, ROWS, split_axis=0,
                                            concat_axis=0)
                    bv = jnp.concatenate([b_val_l[0], rv.reshape(-1)])
            pairs = bucketed_ops.pairs_device(
                bc, bv, vwords, wrows_max, df=use_df) \
                if use_fill else None
            return kern(unstack(fl), a_val, slab_start[0], bc, bv,
                        pairs)

        in_specs = (P(ROWS),) * 5 + (P(ROWS),) * len(flat)
        args = (a_val, slab_start, b_col_l, b_val_l, send_src, *flat)

    fn = jax.jit(jax.shard_map(
        wrapped, mesh=mesh, in_specs=in_specs,
        out_specs=(P(ROWS), P(ROWS), P(ROWS), P(ROWS)),
        # pallas_call inside shard_map cannot annotate its out_shape
        # with varying-mesh-axes metadata; skip the vma check
        check_vma=False))
    crow_nnz, col_cap, val_cap, nnz_tot = fn(*args)
    if state is not None:
        state.update(fn=fn, args=args, R=R, total=total, bounds=bounds)
    return _assemble(A, B, D, R, total, crow_nnz, col_cap, val_cap,
                     nnz_tot, bounds=bounds)


def _shard_bucketed_overlap_kernel(local_arrays, halo_arrays, a_val,
                                   slab_start, b_col_l, b_val_l,
                                   send_src, pairs_l, *, specs_l,
                                   specs_h, m_cap: int, nnz_cap: int,
                                   rows_local: int, vwords: int,
                                   wrows_max_h: int,
                                   use_fill_h: bool = False,
                                   interpret: bool = False,
                                   df: bool = False):
    """Overlapped ragged shard kernel: the halo ``all_to_all`` is issued
    FIRST but its result is consumed only by the halo-row stage, so
    XLA's async-collective scheduling runs the exchange over ICI/DCN
    concurrently with the local-row stage's compute (SURVEY.md §5.8:
    remote fetch overlapped with local accumulation).  Local-only rows
    and halo rows are disjoint, so one merged extraction emits the CSR.

    Stage 1 (local-only rows) reads the shard's own B block — its Mosaic
    pairs stream ``pairs_l`` is host-built per shard and resident before
    the exchange, so the fill frontend also overlaps the collective;
    stage 2's stream is re-encoded on device from the [local | halo]
    payload after the exchange lands.  ``df`` as in
    ``_shard_bucketed_kernel``."""
    a_val = a_val.reshape(2, -1) if df else a_val.reshape(-1)
    bl_col = b_col_l.reshape(-1)
    bl_val = b_val_l.reshape(2, -1) if df else b_val_l.reshape(-1)
    # start the exchange (async on TPU): pack host-planned payloads
    pc = bl_col[send_src[0]]
    rc = jax.lax.all_to_all(pc, ROWS, split_axis=0, concat_axis=0)
    if df:
        pv = bl_val[:, send_src[0]]                  # [2, D, v_cap]
        rv = jax.lax.all_to_all(pv, ROWS, split_axis=1, concat_axis=1)
    else:
        pv = bl_val[send_src[0]]
        rv = jax.lax.all_to_all(pv, ROWS, split_axis=0, concat_axis=0)
    # stage 1: rows whose every reference is shard-local — depends only
    # on the local block, overlaps the in-flight exchange
    crow1, _, _, slabs1 = bucketed_ops.bucketed_main(
        local_arrays, a_val, bl_col, bl_val, pairs_l,
        jnp.zeros((2,), jnp.int32),
        specs=specs_l, m=m_cap, interpret=interpret, df=df)
    # stage 2: halo rows against the [local | halo] payload layout
    bc = jnp.concatenate([bl_col, rc.reshape(-1)])
    if df:
        bv = jnp.concatenate([bl_val, rv.reshape(2, -1)], axis=1)
    else:
        bv = jnp.concatenate([bl_val, rv.reshape(-1)])
    pairs_h = bucketed_ops.pairs_device(
        bc, bv, vwords, wrows_max_h, df=df) if use_fill_h else \
        jnp.zeros((1, 128), jnp.int32)
    crow2, _, _, slabs2 = bucketed_ops.bucketed_main(
        halo_arrays, a_val, bc, bv, pairs_h,
        jnp.zeros((2,), jnp.int32),
        specs=specs_h, m=m_cap, interpret=interpret, df=df)
    crow = crow1 + crow2                      # disjoint row sets
    cptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(crow)])
    ccol, cval = bucketed_ops.bucketed_extract(
        slabs1 + slabs2, slab_start.reshape(-1), cptr, m=m_cap,
        nnz_cap=nnz_cap, df=df)
    return (crow[:rows_local][None], ccol[None], cval[None],
            cptr[m_cap].reshape(1))


def _spgemm_dist_ragged_overlap(A: CSR, B: CSR, mesh: Mesh,
                                config: SpGEMMConfig,
                                state: Optional[dict]) -> CSR:
    """Plan and dispatch the overlapped ragged-bucketed path (work-
    balanced partition, production width classes, df32 values and the
    Mosaic fill on both stages — parity with _spgemm_dist_bucketed)."""
    D = mesh.devices.size
    vdtype = config.vdtype
    bounds = balance_bounds(A, B, D)
    part = partition_rows(A, D, value_dtype=vdtype, bounds=bounds)
    R = part.rows_per_shard
    blens = np.diff(B.ptr).astype(np.int64)
    per_nnz = blens[A.col]
    caps = []
    for d in range(D):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        caps.append(int(per_nnz[A.ptr[lo]:A.ptr[hi]].sum())
                    if hi > lo else 0)
    total = quantize(max(1, max(caps)))
    require(total < 2**31, SpGEMMError,
            "per-shard product stream exceeds int32")

    vwords = 2 if np.dtype(vdtype) == np.float64 else 1
    p_row_max = int(np.max(np.diff(np.concatenate(
        [[0], np.cumsum(per_nnz)])[A.ptr]), initial=0))
    use_df = (vwords == 2 and config.df32 != "off"
              and (config.df32 == "on" or esc_tail_ops.df_range_ok(
                  A.val, B.val, 2 * max(1, p_row_max))))
    dma_fill = config.dma_fill
    if vwords == 2 and not use_df:
        dma_fill = "off"              # no raw-f64 word encode on device
    interpret = config.dma_fill == "interpret"

    bpart = partition_rows(B, D, value_dtype=vdtype)
    fp = plan_ragged_fetch(A, B, part, bpart)
    n_cap = fp.recv_len.shape[1]

    # per shard: split rows into local-only vs halo; build per-stage
    # column arrays where the OTHER stage's entries hit a zero-length
    # sentinel row (excluded from that stage's classes)
    loc_cols, halo_cols = [], []
    loc_starts, loc_lens, halo_starts, halo_lens = [], [], [], []
    for d in range(D):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        k = int(A.ptr[hi] - A.ptr[lo]) if hi > lo else 0
        cols = A.col[A.ptr[lo]:A.ptr[lo] + k].astype(np.int64)
        is_remote = np.searchsorted(bpart.bounds[1:], cols,
                                    side="right") != d
        row_of = np.repeat(np.arange(max(hi - lo, 0)),
                           np.diff(A.ptr[lo:hi + 1])) if hi > lo else \
            np.zeros(0, np.int64)
        halo_row = np.zeros(max(hi - lo, 1), bool)
        if k:
            np.maximum.at(halo_row, row_of, is_remote)
        ent_is_halo = halo_row[row_of] if k else np.zeros(0, bool)
        # stage-1 layout: local block CSR + zero-length sentinel (halo
        # rows' entries land there and fall out of stage-1's classes)
        base = B.ptr[int(bpart.bounds[d])]
        loc_cols.append(np.where(ent_is_halo, B.M, cols).astype(np.int32))
        loc_starts.append(np.concatenate([B.ptr[:-1] - base, [0]]))
        loc_lens.append(np.concatenate([blens, [0]]))
        # stage-2 layout: needed-row payload + sentinel
        hs = np.concatenate([fp.recv_start[d].astype(np.int64), [0]])
        hl = np.concatenate([fp.recv_len[d].astype(np.int64), [0]])
        sent2 = n_cap
        hc = np.where(ent_is_halo, fp.a_col_remap[d][:k], sent2)
        halo_cols.append(hc.astype(np.int32))
        halo_starts.append(hs)
        halo_lens.append(hl)
    plan_kw = dict(min_width=config.min_bucket_width,
                   area_cap=config.bucket_area_cap, dma_fill=dma_fill,
                   vwords=vwords, bounds=bounds)
    plans_l = bucketed_ops.plan_buckets_sharded(
        A.ptr, A.col, D, R, b_starts=loc_starts, b_lens=loc_lens,
        a_col_shards=loc_cols, **plan_kw)
    plans_h = bucketed_ops.plan_buckets_sharded(
        A.ptr, A.col, D, R, b_starts=halo_starts, b_lens=halo_lens,
        a_col_shards=halo_cols, **plan_kw)

    # Plan-time overlap-vs-ragged decision.  Round-3's area-only 1.25x
    # slack failed exactly where it mattered (DIST_SCALING_r3: scircuit
    # D=4 overlap 500 vs ragged 279 ms, D=8 386 vs 329 — VERDICT round-4
    # weak #5): the local/halo split doubles the per-program CLASS count
    # and each class costs a fixed dispatch overhead the area ratio
    # never sees.  Model both timelines explicitly:
    #   overlap ~ max(comm, stage1) + stage2 + (ncl+nch) * F
    #   ragged  ~ comm + single_stage + ncr * F
    # and take overlap only when the model says it wins.  With no
    # second execution resource (CPU mesh) or no comm (D=1), comm
    # hiding buys nothing and the split's overhead always loses -> fall
    # back, which matches every recorded point.  Constants are coarse
    # (decision-grade, not prediction-grade): per-slot ns from the
    # engine cost model, per-class fixed cost and comm bandwidth by
    # backend.
    def _area(plans):
        return sum(c.W * c.rb * c.nchunks for c in plans[0].classes)

    def _ncls(plans):
        return len(plans[0].classes)

    rag_cols = [fp.a_col_remap[d][: len(loc_cols[d])].astype(np.int32)
                for d in range(D)]
    plans_r = bucketed_ops.plan_buckets_sharded(
        A.ptr, A.col, D, R, b_starts=halo_starts, b_lens=halo_lens,
        a_col_shards=rag_cols, **plan_kw)
    on_tpu = mesh.devices.flat[0].platform != "cpu"
    slot_ns = 5.0 if on_tpu else 8.0
    fixed_ms = 0.3 if on_tpu else 1.0          # per-class dispatch cost
    bw_gbs = 45.0 if on_tpu else 10.0          # ICI vs host memcpy
    words_per_nnz = 1 + vwords
    comm_ms = (float(fp.recv_len.sum(axis=1).max(initial=0))
               * words_per_nnz * 4 / (bw_gbs * 1e6)) if D > 1 else 0.0
    s1 = _area(plans_l) * slot_ns * 1e-6
    s2 = _area(plans_h) * slot_ns * 1e-6
    sr = _area(plans_r) * slot_ns * 1e-6
    est_overlap = max(comm_ms, s1) + s2 + (
        _ncls(plans_l) + _ncls(plans_h)) * fixed_ms
    est_ragged = comm_ms + sr + _ncls(plans_r) * fixed_ms
    # MHSPGEMM_FORCE_OVERLAP=1 pins the overlap kernel (tests; A/B runs)
    if (est_overlap >= est_ragged
            and os.environ.get("MHSPGEMM_FORCE_OVERLAP") != "1"):
        return _spgemm_dist_bucketed(A, B, mesh, config, "ragged",
                                     state)
    specs_l = tuple(c.spec for c in plans_l[0].classes)
    specs_h = tuple(c.spec for c in plans_h[0].classes)
    m_cap = plans_l[0].m_cap
    area1 = sum(c.W * c.rb * c.nchunks for c in plans_l[0].classes)
    # merged slab offsets: halo-stage slabs live after the local-stage
    # slabs in the extraction's concatenated view; a row belongs to
    # exactly one stage, so the sum with a membership-gated offset is
    # exact (rows absent from both stay 0 and have crow 0)
    slab_start = np.stack([
        plans_l[d].slab_row_start
        + np.where(_rows_in(plans_h[d]),
                   plans_h[d].slab_row_start + area1, 0)
        for d in range(D)]).astype(np.int32)

    shard = NamedSharding(mesh, P(ROWS))
    if use_df:
        hi_, lo_ = esc_tail_ops.dekker_split_np(
            part.val.astype(np.float64))
        a_val = _put(np.stack([hi_, lo_], axis=1), shard)
        bhi, blo = esc_tail_ops.dekker_split_np(
            bpart.val.astype(np.float64))
        b_val_l = _put(np.stack([bhi, blo], axis=1), shard)
    else:
        a_val = _put(part.val, shard)
        b_val_l = _put(bpart.val, shard)
    b_col_l = _put(bpart.col, shard)
    send_src = _put(fp.send_src, shard)
    # stage-1 fill stream: per-shard local-block pairs, host-built and
    # device-resident BEFORE the exchange (overlaps the collective)
    use_fill_l = bucketed_ops.needs_pairs(plans_l[0])
    use_fill_h = bucketed_ops.needs_pairs(plans_h[0])
    wrows_l = bucketed_ops.pairs_wrows_max(plans_l[0])
    wrows_h = bucketed_ops.pairs_wrows_max(plans_h[0])
    if use_fill_l:
        pairs_l = _put(np.stack([bucketed_ops.build_pairs(
            bpart.col[d], bpart.val[d].astype(vdtype), vwords, wrows_l,
            df=use_df) for d in range(D)]), shard)
    else:
        pairs_l = _put(np.zeros((D, 1, 128), np.int32), shard)
    flat_l, counts_l = _stack_plans(plans_l, shard)
    flat_h, counts_h = _stack_plans(plans_h, shard)
    slab_start_d = _put(slab_start, shard)

    nl = len(flat_l)

    def wrapped(a_val, slab_start, b_col_l, b_val_l, send_src, pairs_l,
                *fl):
        return _shard_bucketed_overlap_kernel(
            _unstack_counts(fl[:nl], counts_l),
            _unstack_counts(fl[nl:], counts_h),
            a_val, slab_start[0], b_col_l[0], b_val_l[0], send_src,
            pairs_l[0], specs_l=specs_l, specs_h=specs_h, m_cap=m_cap,
            nnz_cap=total, rows_local=R, vwords=vwords,
            wrows_max_h=wrows_h, use_fill_h=use_fill_h,
            interpret=interpret, df=use_df)

    args = (a_val, slab_start_d, b_col_l, b_val_l, send_src, pairs_l,
            *flat_l, *flat_h)
    fn = jax.jit(jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(ROWS),) * len(args),
        out_specs=(P(ROWS), P(ROWS), P(ROWS), P(ROWS)),
        check_vma=False))
    crow_nnz, col_cap, val_cap, nnz_tot = fn(*args)
    if state is not None:
        state.update(fn=fn, args=args, R=R, total=total, bounds=bounds)
    return _assemble(A, B, D, R, total, crow_nnz, col_cap, val_cap,
                     nnz_tot, bounds=bounds)


def plan_col_blocks(B: CSR, dc: int):
    """Column-balanced partition of B into ``dc`` column blocks, each a
    column-sliced CSR with GLOBAL column ids (so per-row output segments
    from increasing blocks concatenate directly into ascending CSR
    order).  Returns (cbounds int64[dc+1], ptrs, cols, vals lists)."""
    counts = np.bincount(B.col, minlength=B.N).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(counts)])
    targets = (np.arange(1, dc, dtype=np.int64) * B.nnz) // dc
    inner = np.searchsorted(cum[1:-1], targets, side="left")
    cbounds = np.maximum.accumulate(
        np.concatenate([[0], inner, [B.N]]).astype(np.int64))
    blk = np.searchsorted(cbounds[1:], B.col, side="right")
    rows = np.repeat(np.arange(B.M, dtype=np.int64), np.diff(B.ptr))
    ptrs, colss, valss = [], [], []
    for c in range(dc):
        selm = blk == c
        cnt = np.bincount(rows[selm], minlength=B.M)
        ptrs.append(np.concatenate([[0], np.cumsum(cnt)])
                    .astype(np.int64))
        colss.append(B.col[selm].astype(np.int32))
        valss.append(B.val[selm])
    return cbounds, ptrs, colss, valss


def _spgemm_dist_grid2d(A: CSR, B: CSR, mesh: Mesh,
                        config: SpGEMMConfig,
                        state: Optional[dict]) -> CSR:
    """2-D block-partitioned SpGEMM over a (rows x cols) mesh — the
    BASELINE.json north star ("A row-partitioned and B
    block-partitioned"), absent from the single-GPU reference
    (SURVEY.md §2.3).

    Shard (r, c) computes C[rows_r, colrange_c] from A's row block r
    (replicated over ``cols``) and B's column block c.  B starts fully
    block-partitioned — column-sliced over ``cols`` AND row-sharded over
    ``rows`` (nnz(B)/(Dr*Dc) per device) — and each shard materialises
    its column block with ONE ``all_gather`` along ``rows`` inside its
    cols group: per-device traffic ~nnz(B)/Dc vs the 1-D allgather's
    nnz(B).  Output segments per row concatenate in ascending column
    order (global ids are kept), so host assembly is a copy, not a sort.
    """
    from .mesh import COLS
    Dr, Dc = mesh.shape[ROWS], mesh.shape[COLS]
    vdtype = config.vdtype
    bounds = balance_bounds(A, B, Dr)
    part = partition_rows(A, Dr, value_dtype=vdtype, bounds=bounds)
    R = part.rows_per_shard
    cbounds, bptrs, bcols, bvals = plan_col_blocks(B, Dc)

    vwords = 2 if np.dtype(vdtype) == np.float64 else 1
    blens_all = np.diff(B.ptr).astype(np.int64)
    per_nnz = blens_all[A.col]
    p_row_max = int(np.max(np.diff(np.concatenate(
        [[0], np.cumsum(per_nnz)])[A.ptr]), initial=0))
    use_df = (vwords == 2 and config.df32 != "off"
              and (config.df32 == "on" or esc_tail_ops.df_range_ok(
                  A.val, B.val, 2 * max(1, p_row_max))))
    dma_fill = config.dma_fill
    if vwords == 2 and not use_df:
        dma_fill = "off"
    interpret = config.dma_fill == "interpret"

    # B transport blocks: column block c row-sharded over rows shards
    RB = -(-B.M // Dr)
    bcap2 = 1
    for c in range(Dc):
        for r in range(Dr):
            lo, hi = min(r * RB, B.M), min((r + 1) * RB, B.M)
            bcap2 = max(bcap2, int(bptrs[c][hi] - bptrs[c][lo]))
    bcap2 = quantize(bcap2)
    tb_col = np.zeros((Dr, Dc, bcap2), np.int32)
    tb_val = (np.zeros((Dr, Dc, 2, bcap2), np.float32) if use_df
              else np.zeros((Dr, Dc, bcap2), vdtype))
    b_starts_c, b_lens_c = [], []
    own = np.minimum(np.arange(B.M, dtype=np.int64) // RB, Dr - 1)
    for c in range(Dc):
        for r in range(Dr):
            lo, hi = min(r * RB, B.M), min((r + 1) * RB, B.M)
            s, e = int(bptrs[c][lo]), int(bptrs[c][hi])
            tb_col[r, c, : e - s] = bcols[c][s:e]
            if use_df:
                hi_, lo_ = esc_tail_ops.dekker_split_np(
                    bvals[c][s:e].astype(np.float64))
                tb_val[r, c, 0, : e - s] = hi_
                tb_val[r, c, 1, : e - s] = lo_
            else:
                tb_val[r, c, : e - s] = bvals[c][s:e].astype(vdtype)
        # address space seen by every shard of cols group c after the
        # rows-axis all_gather: block r at offset r*bcap2
        starts = (own * bcap2
                  + (bptrs[c][:-1] - bptrs[c][np.minimum(own * RB, B.M)]))
        b_starts_c.append(starts.astype(np.int64))
        b_lens_c.append(np.diff(bptrs[c]).astype(np.int64))

    # virtual shards d = r*Dc + c share A row range r, B column block c
    vbounds = np.array([[int(bounds[r]), int(bounds[r + 1])]
                        for r in range(Dr) for c in range(Dc)],
                       dtype=np.int64)
    plans = bucketed_ops.plan_buckets_sharded(
        A.ptr, A.col, Dr * Dc, R,
        b_starts=[b_starts_c[d % Dc] for d in range(Dr * Dc)],
        b_lens=[b_lens_c[d % Dc] for d in range(Dr * Dc)],
        min_width=config.min_bucket_width,
        area_cap=config.bucket_area_cap,
        dma_fill=dma_fill, vwords=vwords, bounds=vbounds)
    specs = tuple(c.spec for c in plans[0].classes)
    m_cap = plans[0].m_cap
    use_fill = bucketed_ops.needs_pairs(plans[0])
    wrows_max = bucketed_ops.pairs_wrows_max(plans[0])

    caps = []
    for r in range(Dr):
        lo, hi = int(bounds[r]), int(bounds[r + 1])
        acols = A.col[A.ptr[lo]:A.ptr[hi]]
        for c in range(Dc):
            caps.append(int(b_lens_c[c][acols].sum()) if hi > lo else 0)
    total2 = quantize(max(1, max(caps)))
    require(total2 < 2**31, SpGEMMError,
            "per-shard product stream exceeds int32")

    shard2 = NamedSharding(mesh, P(ROWS, COLS))
    shardr = NamedSharding(mesh, P(ROWS))
    if use_df:
        hi_, lo_ = esc_tail_ops.dekker_split_np(
            part.val.astype(np.float64))
        a_val = _put(np.stack([hi_, lo_], axis=1), shardr)
    else:
        a_val = _put(part.val, shardr)
    flat, counts = _stack_plans(plans, shard2, grid=(Dr, Dc))
    slab_start = _put(np.stack(
        [p.slab_row_start for p in plans]).reshape(Dr, Dc, -1), shard2)
    tb_col_d = _put(tb_col, shard2)
    tb_val_d = _put(tb_val, shard2)

    def unstack2(fl):
        out, k = [], 0
        for n in counts:
            out.append(tuple(fl[k + j][0] for j in range(n)))
            k += n
        return out

    kern = functools.partial(_shard_bucketed_kernel, specs=specs,
                             m_cap=m_cap, nnz_cap=total2, rows_local=R,
                             interpret=interpret, df=use_df)

    def wrapped(a_val, slab_start, tb_col, tb_val, *fl):
        # materialise this cols group's column block over the rows axis
        bc = jax.lax.all_gather(tb_col[0, 0], ROWS).reshape(-1)
        bvg = jax.lax.all_gather(tb_val[0, 0], ROWS)  # [Dr,(2,)bcap2]
        bv = (jnp.moveaxis(bvg, 0, 1).reshape(2, -1) if use_df
              else bvg.reshape(-1))
        pairs = bucketed_ops.pairs_device(
            bc, bv, vwords, wrows_max, df=use_df) if use_fill else None
        crow, ccol, cval, nnz = kern(
            unstack2([f[0] for f in fl]), a_val, slab_start[0, 0],
            bc, bv, pairs)
        return crow[None], ccol[None], cval[None], nnz[None]

    args = (a_val, slab_start, tb_col_d, tb_val_d, *flat)
    fn = jax.jit(jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(ROWS), P(ROWS, COLS), P(ROWS, COLS), P(ROWS, COLS))
        + (P(ROWS, COLS),) * len(flat),
        out_specs=(P(ROWS, COLS),) * 4, check_vma=False))
    crow_nnz, col_cap, val_cap, nnz_tot = fn(*args)
    if state is not None:
        state.update(fn=fn, args=args, R=R, total=total2, bounds=bounds,
                     grid=(Dr, Dc))
    return _assemble2d(A, B, Dr, Dc, R, total2, crow_nnz, col_cap,
                       val_cap, nnz_tot, bounds)


def _assemble2d(A: CSR, B: CSR, Dr: int, Dc: int, R: int, total2: int,
                crow_nnz, col_cap, val_cap, nnz_tot, bounds) -> CSR:
    """Host assembly for the 2-D grid: row r's CSR entries are the
    concatenation over c of shard (r, c)'s packed segment for that row
    (ascending column order is preserved — blocks carry global ids)."""
    crow = _to_np(crow_nnz).reshape(Dr, Dc, R)
    nnz_tot = _to_np(nnz_tot).reshape(Dr, Dc)
    col_cap = _to_np(col_cap).reshape(Dr, Dc, total2)
    val_cap = _to_np(val_cap).reshape(Dr, Dc, total2)
    seg = np.zeros((A.M, Dc), np.int64)
    for r in range(Dr):
        lo, hi = int(bounds[r]), int(bounds[r + 1])
        if hi > lo:
            seg[lo:hi] = crow[r, :, : hi - lo].T
    crow_total = seg.sum(axis=1)
    total_nnz = int(crow_total.sum())
    require(total_nnz < 2**31, SpGEMMError, "nnz(C) exceeds int32")
    cptr = np.zeros(A.M + 1, dtype=np.int64)
    np.cumsum(crow_total, out=cptr[1:])
    seg_dst = cptr[:-1, None] + np.concatenate(
        [np.zeros((A.M, 1), np.int64), np.cumsum(seg, axis=1)[:, :-1]],
        axis=1)
    cols = np.zeros(total_nnz, np.int32)
    vals = np.zeros(total_nnz, val_cap.dtype)
    for r in range(Dr):
        lo, hi = int(bounds[r]), int(bounds[r + 1])
        if hi <= lo:
            continue
        for c in range(Dc):
            lens = crow[r, c, : hi - lo].astype(np.int64)
            n = int(lens.sum())
            if n == 0:
                continue
            dst0 = np.repeat(seg_dst[lo:hi, c], lens)
            within = (np.arange(n, dtype=np.int64)
                      - np.repeat(np.cumsum(lens) - lens, lens))
            idx = dst0 + within
            cols[idx] = col_cap[r, c, :n]
            vals[idx] = val_cap[r, c, :n]
    return CSR(M=A.M, N=B.N, ptr=cptr.astype(np.int32), col=cols,
               val=vals)


def _rows_in(plan) -> np.ndarray:
    """Bool[m_cap]: rows that appear in any class of the plan."""
    out = np.zeros(plan.m_cap, bool)
    for c in plan.classes:
        rows = c.rows_g.reshape(-1)
        out[rows[rows >= 0]] = True
    return out


def _dist_chunked(A: CSR, B: CSR, mesh: Mesh, config: SpGEMMConfig,
                  b_strategy: str, budget: int = 1 << 27) -> CSR:
    """Row-chunked distributed fallback: when one shard's padded plan
    would overflow int32, split A into global row ranges bounded by
    ``budget`` intermediate products, run each range over the WHOLE mesh,
    and concatenate (the distributed analogue of pipeline.spgemm_chunked;
    closes VERDICT round-1 weak item 4)."""
    blens = np.diff(B.ptr).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(blens[A.col])])
    p_cum = cs[A.ptr]
    bounds = [0]
    while bounds[-1] < A.M:
        lo = bounds[-1]
        hi = int(np.searchsorted(p_cum, p_cum[lo] + budget,
                                 side="right")) - 1
        bounds.append(max(hi, lo + 1))
    pieces = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        sub = CSR(M=hi - lo, N=A.N,
                  ptr=(A.ptr[lo:hi + 1] - A.ptr[lo]).astype(np.int32),
                  col=A.col[A.ptr[lo]:A.ptr[hi]],
                  val=A.val[A.ptr[lo]:A.ptr[hi]])
        pieces.append(_spgemm_dist_bucketed(sub, B, mesh, config,
                                            b_strategy, None))
    ptr = np.zeros(A.M + 1, np.int64)
    cols, vals = [], []
    base = 0
    for (lo, hi), Cp in zip(zip(bounds[:-1], bounds[1:]), pieces):
        ptr[lo + 1: hi + 1] = Cp.ptr[1:].astype(np.int64) + base
        cols.append(Cp.col)
        vals.append(Cp.val)
        base += Cp.nnz
    require(base < 2**31, SpGEMMError, "nnz(C) exceeds int32")
    return CSR(M=A.M, N=B.N, ptr=ptr.astype(np.int32),
               col=(np.concatenate(cols) if cols else
                    np.zeros(0, np.int32)),
               val=(np.concatenate(vals) if vals else
                    np.zeros(0, np.float64)))


def _assemble(A: CSR, B: CSR, D: int, R: int, total: int,
              crow_nnz, col_cap, val_cap, nnz_tot,
              bounds=None) -> CSR:
    """Host assembly: trim each shard's capacity block to its true nnz.

    ``bounds``: owned row ranges under a work-balanced partition (each
    shard's crow block is padded to R rows; trailing pad rows are 0)."""
    if bounds is not None:
        blk = _to_np(crow_nnz).reshape(D, R)
        crow_nnz = np.concatenate(
            [blk[d, :int(bounds[d + 1] - bounds[d])] for d in range(D)])
    else:
        crow_nnz = _to_np(crow_nnz).reshape(D * R)[:A.M]
    nnz_tot = _to_np(nnz_tot).reshape(D)
    col_cap = _to_np(col_cap).reshape(D, total)
    val_cap = _to_np(val_cap).reshape(D, total)
    cols = np.concatenate([col_cap[d, :nnz_tot[d]] for d in range(D)]) \
        if nnz_tot.sum() else np.zeros((0,), np.int32)
    vals = np.concatenate([val_cap[d, :nnz_tot[d]] for d in range(D)]) \
        if nnz_tot.sum() else np.zeros((0,), val_cap.dtype)
    cptr = np.zeros(A.M + 1, dtype=np.int32)
    np.cumsum(crow_nnz, out=cptr[1:])
    return CSR(M=A.M, N=B.N, ptr=cptr, col=cols.astype(np.int32), val=vals)
