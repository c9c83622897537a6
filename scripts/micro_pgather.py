"""Probe: planned windowed VMEM gather throughput in a Mosaic kernel.

The capability being measured: out[g, l] = tab[w0[g] + rel[g, l]] where
slots were host-sorted by source so each output row of 128 slots reads a
512-word window at a static, 128-aligned start w0[g].  In-kernel per
row: one dynamic [4, 128] sublane load + lane-gather (take_along_axis
axis=1) + sublane-gather (axis=0, R=4).

Usage: python scripts/micro_pgather.py [S] [T]
"""
import sys
sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RTT = None


def _fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def _rtt():
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
    out = fn(*args)
    _fetch1(out)
    rtt = _rtt()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch1(out)
    return max(0.0, time.perf_counter() - t0 - rtt) / iters * 1e3


def plan_windows(src_sorted: np.ndarray, win: int = 512):
    """Greedy static schedule: groups of <=128 slots whose (sorted)
    sources fit a ``win``-word window starting at a 128-aligned w0.
    Returns (w0 [G], rel [G, 128], n_real [G])."""
    S = src_sorted.size
    w0s, rels = [], []
    i = 0
    while i < S:
        base = (int(src_sorted[i]) // 128) * 128
        j = min(S, i + 128)
        # shrink j until span fits
        while src_sorted[j - 1] >= base + win:
            j = i + int(np.searchsorted(src_sorted[i:j],
                                        base + win))
        rel = np.zeros(128, np.int32)
        rel[: j - i] = src_sorted[i:j] - base
        w0s.append(base)
        rels.append(rel)
        i = j
    return (np.asarray(w0s, np.int32),
            np.stack(rels).astype(np.int32))


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, T, S)).astype(np.int32)
    w0, rel = plan_windows(src)
    G = w0.shape[0]
    print(f"S={S} T={T} groups={G} pad={(G*128)/S:.2f}x")
    Tr = -(-T // 128) + 4
    tab = rng.integers(0, 1 << 30, Tr * 128).astype(np.int32)

    def kern(w0_ref, tab_ref, rel_ref, out_ref):
        def body(g, _):
            base_r = w0_ref[g] // 128
            winv = tab_ref[pl.ds(base_r, 4), :]          # [4, 128]
            r = rel_ref[pl.ds(g, 1), :]                  # [1, 128]
            lane = jax.lax.rem(r, 128)
            row = jax.lax.div(r, 128)
            lane4 = jnp.broadcast_to(lane, (4, 128))
            row4 = jnp.broadcast_to(row, (4, 128))
            picks = jnp.take_along_axis(winv, lane4, axis=1)
            out_ref[pl.ds(g, 1), :] = jnp.take_along_axis(
                picks, row4, axis=0)[:1]
            return 0
        jax.lax.fori_loop(0, G, body, 0)

    @jax.jit
    def run(w0d, tabd, reld):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((G, 128), jnp.int32),
        )(w0d, tabd, reld)

    w0d = jnp.asarray(w0)
    tabd = jnp.asarray(tab.reshape(Tr, 128))
    reld = jnp.asarray(rel)
    out = run(w0d, tabd, reld)
    ref = tab[np.minimum(w0[:, None] + rel, Tr * 128 - 1)]
    ok = np.array_equal(np.asarray(out), ref)
    print("correct:", ok)
    t = _time(run, w0d, tabd, reld)
    print(f"windowed gather: {t:7.3f} ms  {t*1e6/S:6.2f} ns/slot")


if __name__ == "__main__":
    main()


def plan_windows_blk(src_sorted, slots_blk=1024, win=2048):
    """Schedule for block processing: groups of <= slots_blk slots whose
    sorted sources fit a ``win``-word 128-aligned window."""
    S = src_sorted.size
    w0s, rels = [], []
    i = 0
    while i < S:
        base = (int(src_sorted[i]) // 128) * 128
        j = min(S, i + slots_blk)
        if src_sorted[j - 1] >= base + win:
            j = i + int(np.searchsorted(src_sorted[i:j], base + win))
        rel = np.zeros(slots_blk, np.int32)
        rel[: j - i] = src_sorted[i:j] - base
        w0s.append(base)
        rels.append(rel)
        i = j
    return (np.asarray(w0s, np.int32),
            np.stack(rels).astype(np.int32))


def blk():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, T, S)).astype(np.int32)
    w0, rel = plan_windows_blk(src)
    G = w0.shape[0]
    print(f"[blk] S={S} T={T} groups={G} pad={(G*1024)/S:.2f}x")
    Tr = -(-T // 128) + 16
    tab = rng.integers(0, 1 << 30, Tr * 128).astype(np.int32)

    def kern(w0_ref, tab_ref, rel_ref, out_ref):
        def body(g, _):
            base_r = w0_ref[g] // 128
            winv = tab_ref[pl.ds(base_r, 16), :]          # [16, 128]
            r = rel_ref[pl.ds(g * 8, 8), :]               # [8, 128]
            lane = jax.lax.rem(r, 128)
            row = jax.lax.div(r, 128)                     # 0..15
            # lane pick from each of the 16 window rows, two 8-row
            # sublane gathers + select for the 16-row reach
            low = jnp.take_along_axis(
                jnp.take_along_axis(winv[:8], lane[:8].repeat(0, 0)
                                    if False else
                                    jnp.broadcast_to(lane[0:1], (8, 128)),
                                    axis=1),
                jnp.broadcast_to(row[0:1], (8, 128)) & 7, axis=0)
            return 0
        jax.lax.fori_loop(0, G, body, 0)

    # the above got convoluted; do it per 128-slot row but unrolled 8x
    def kern2(w0_ref, tab_ref, rel_ref, out_ref):
        def body(g, _):
            base_r = w0_ref[g] // 128
            winv = tab_ref[pl.ds(base_r, 16), :]          # [16, 128]
            wlow, whigh = winv[:8], winv[8:]
            outs = []
            for k in range(8):
                r = rel_ref[pl.ds(g * 8 + k, 1), :]       # [1, 128]
                lane8 = jnp.broadcast_to(
                    jax.lax.rem(r, 128), (8, 128))
                row = jax.lax.div(r, 128)                 # 0..15
                row8 = jnp.broadcast_to(row & 7, (8, 128))
                pl_ = jnp.take_along_axis(wlow, lane8, axis=1)
                ph = jnp.take_along_axis(whigh, lane8, axis=1)
                gl = jnp.take_along_axis(pl_, row8, axis=0)[:1]
                gh = jnp.take_along_axis(ph, row8, axis=0)[:1]
                outs.append(jnp.where(row < 8, gl, gh))
            out_ref[pl.ds(g * 8, 8), :] = jnp.concatenate(outs, axis=0)
            return 0
        jax.lax.fori_loop(0, G, body, 0)

    @jax.jit
    def run(w0d, tabd, reld):
        return pl.pallas_call(
            kern2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.int32),
        )(w0d, tabd, reld)

    w0d = jnp.asarray(w0)
    tabd = jnp.asarray(tab.reshape(Tr, 128))
    reld = jnp.asarray(rel.reshape(G * 8, 128))
    out = run(w0d, tabd, reld)
    ref = tab[np.minimum(w0[:, None] + rel, Tr * 128 - 1)]
    ok = np.array_equal(np.asarray(out).reshape(G, 1024), ref)
    print("[blk] correct:", ok)
    t = _time(run, w0d, tabd, reld)
    print(f"[blk] windowed gather: {t:7.3f} ms  {t*1e6/S:6.2f} ns/slot")


blk()


def grid_version():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, T, S)).astype(np.int32)
    w0, rel = plan_windows(src)            # 128-slot groups, 512 windows
    G = w0.shape[0]
    w0 = (w0 // 128).astype(np.int32)      # window ROW index (aligned)
    print(f"[grid] S={S} T={T} groups={G} pad={(G*128)/S:.2f}x")
    Tr = -(-T // 128) + 4
    tab = rng.integers(0, 1 << 30, Tr * 128).astype(np.int32)

    def kern(w0_ref, win_ref, rel_ref, out_ref):
        r = rel_ref[...]                       # [1, 128]
        lane4 = jnp.broadcast_to(jax.lax.rem(r, 128), (4, 128))
        row4 = jnp.broadcast_to(jax.lax.div(r, 128), (4, 128))
        picks = jnp.take_along_axis(win_ref[...], lane4, axis=1)
        out_ref[...] = jnp.take_along_axis(picks, row4, axis=0)[:1]

    @jax.jit
    def run(w0d, tabd, reld):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((4, 128),
                                 lambda g, w0: (w0[g], 0)),
                    pl.BlockSpec((1, 128), lambda g, w0: (g, 0)),
                ],
                out_specs=pl.BlockSpec((1, 128),
                                       lambda g, w0: (g, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((G, 128), jnp.int32),
        )(w0d, tabd, reld)

    # window block indexing is in units of (4,128) blocks -> w0 must be
    # 512-word aligned; re-plan with 512-aligned starts
    def plan_aligned(src_sorted, win=512):
        S = src_sorted.size
        w0s, rels = [], []
        i = 0
        while i < S:
            base = (int(src_sorted[i]) // win) * win
            j = min(S, i + 128)
            if src_sorted[j - 1] >= base + win:
                j = i + int(np.searchsorted(src_sorted[i:j],
                                            base + win))
            rl = np.zeros(128, np.int32)
            rl[: j - i] = src_sorted[i:j] - base
            w0s.append(base // 512)          # (4,128)-block units
            rels.append(rl)
            i = j
        return (np.asarray(w0s, np.int32),
                np.stack(rels).astype(np.int32))

    w0, rel = plan_aligned(src)
    G = w0.shape[0]
    print(f"[grid] aligned groups={G} pad={(G*128)/S:.2f}x")

    @jax.jit
    def run2(w0d, tabd, reld):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((4, 128),
                                 lambda g, w0: (w0[g], 0)),
                    pl.BlockSpec((1, 128), lambda g, w0: (g, 0)),
                ],
                out_specs=pl.BlockSpec((1, 128),
                                       lambda g, w0: (g, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((G, 128), jnp.int32),
        )(w0d, jnp.asarray(tab.reshape(Tr, 128)), reld)

    w0d = jnp.asarray(w0)
    reld = jnp.asarray(rel)
    tabd = jnp.asarray(tab.reshape(Tr, 128))
    out = run2(w0d, tabd, reld)
    ref = tab[np.minimum(w0[:, None] * 512 + rel, Tr * 128 - 1)]
    ok = np.array_equal(np.asarray(out), ref)
    print("[grid] correct:", ok)
    t = _time(run2, w0d, tabd, reld)
    print(f"[grid] windowed gather: {t:7.3f} ms  {t*1e6/S:6.2f} ns/slot")


# grid_version()  # (4,128) window blocks rejected: sublane block must be 8


def plan_rowbin(src_sorted, blk_rows=8):
    """Row-constant schedule: each output row of 128 slots reads ONE
    128-word table row; 8 output rows per block share an aligned
    1024-word window.  Returns (wblk [Gb], rel [Gb*8, 128], perm) where
    perm maps scheduled position -> original sorted-slot index."""
    S = src_sorted.size
    tabrow = src_sorted // 128
    # output rows: (tab_row, slot_indices chunk of <=128)
    rows = []
    i = 0
    while i < S:
        r = tabrow[i]
        j = min(S, i + 128)
        j = i + int(np.searchsorted(tabrow[i:j], r + 1))
        rows.append((int(r), i, j))
        i = j
    # group rows by aligned 8-row window; pad each window group to 8
    wblks, rels, perm = [], [], []
    k = 0
    while k < len(rows):
        w = rows[k][0] // 8
        e = k
        while e < len(rows) and rows[e][0] // 8 == w:
            e += 1
        chunk = rows[k:e]
        for off in range(0, len(chunk), 8):
            sub = chunk[off: off + 8]
            rl = np.zeros((8, 128), np.int32)
            for q, (r, i0, j0) in enumerate(sub):
                n = j0 - i0
                rl[q, :n] = src_sorted[i0:j0] - w * 1024
                rl[q, n:] = src_sorted[j0 - 1] - w * 1024 if n else 0
                perm.extend(range(i0, j0))
                perm.extend([-1] * (128 - n))
            for q in range(len(sub), 8):
                perm.extend([-1] * 128)
            wblks.append(w)
            rels.append(rl)
        k = e
    return (np.asarray(wblks, np.int32),
            np.concatenate(rels).astype(np.int32).reshape(-1, 128),
            np.asarray(perm, np.int64))


def rowbin_version():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, T, S)).astype(np.int32)
    wblk, rel, perm = plan_rowbin(src)
    Gb = wblk.shape[0]
    print(f"[rowbin] S={S} T={T} wblocks={Gb} "
          f"pad={(Gb*1024)/S:.2f}x")
    Tr = (-(-T // 1024) + 1) * 8
    tab = rng.integers(0, 1 << 30, Tr * 128).astype(np.int32)

    def kern(wblk_ref, win_ref, rel_ref, out_ref):
        r = rel_ref[...]                          # [8, 128]
        row8 = jax.lax.div(r, 128)                # constant per row
        lane8 = jax.lax.rem(r, 128)
        B = jnp.take_along_axis(win_ref[...], row8, axis=0)
        out_ref[...] = jnp.take_along_axis(B, lane8, axis=1)

    @jax.jit
    def run(wblkd, tabd, reld):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Gb,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda g, w: (w[g], 0)),
                    pl.BlockSpec((8, 128), lambda g, w: (g, 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda g, w: (g, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((Gb * 8, 128), jnp.int32),
        )(wblkd, tabd, reld)

    wblkd = jnp.asarray(wblk)
    tabd = jnp.asarray(tab.reshape(Tr, 128))
    reld = jnp.asarray(rel)
    out = run(wblkd, tabd, reld)
    flat = np.asarray(out).reshape(-1)
    live = perm >= 0
    ok = np.array_equal(flat[live], tab[src[perm[live]]])
    print("[rowbin] correct:", ok)
    t = _time(run, wblkd, tabd, reld)
    print(f"[rowbin] windowed gather: {t:7.3f} ms  "
          f"{t*1e6/S:6.2f} ns/slot ({t*1e6/(Gb*1024):5.2f} ns/sched)")


rowbin_version()


def hybrid_version():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 163840
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, T, S)).astype(np.int32)
    wblk, rel, perm = plan_rowbin(src)
    Gb = wblk.shape[0]
    print(f"[hybrid] S={S} T={T} wblocks={Gb} pad={(Gb*1024)/S:.2f}x")
    Tr = (-(-T // 1024) + 1) * 8
    tab = rng.integers(0, 1 << 30, Tr * 128).astype(np.int32)
    sub_iota = np.arange(8, dtype=np.int32)[:, None] * np.ones(
        (1, 128), np.int32)

    def kern(wblk_ref, tab_ref, rel_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def body(g, _):
            win = tab_ref[pl.ds(wblk_ref[g] * 8, 8), :]   # [8, 128]
            r = rel_ref[pl.ds(g * 8, 8), :]               # [8, 128]
            row8 = jax.lax.div(r, 128)                    # const/row
            lane8 = jax.lax.rem(r, 128)
            # row select: B[j, l] = win[row8[j], l] via masked sums
            B = jnp.zeros((8, 128), jnp.int32)
            for q in range(8):
                B = B + jnp.where(row8 == q, win[q][None, :], 0)
            out_ref[pl.ds(g * 8, 8), :] = jnp.take_along_axis(
                B, lane8, axis=1)
            return 0
        jax.lax.fori_loop(0, Gb, body, 0)

    @jax.jit
    def run(wblkd, tabd, reld):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((Gb * 8, 128), jnp.int32),
        )(wblkd, tabd, reld)

    wblkd = jnp.asarray(wblk)
    tabd = jnp.asarray(tab.reshape(Tr, 128))
    reld = jnp.asarray(rel)
    out = run(wblkd, tabd, reld)
    flat = np.asarray(out).reshape(-1)
    live = perm >= 0
    ok = np.array_equal(flat[live], tab[src[perm[live]]])
    print("[hybrid] correct:", ok)
    for rep in range(6):
        t = _time(run, wblkd, tabd, reld, iters=30)
        print(f"[hybrid] windowed gather: {t:7.3f} ms  "
              f"{t*1e6/S:6.2f} ns/slot")


hybrid_version()


def overhead_probe():
    rng = np.random.default_rng(0)
    Gb = 256
    tab = jnp.asarray(rng.integers(0, 1 << 30, (2056, 128))
                      .astype(np.int32))
    rel = jnp.asarray(rng.integers(0, 1024, (Gb * 8, 128))
                      .astype(np.int32))
    wblk = jnp.asarray(rng.integers(0, 250, Gb).astype(np.int32))

    def mk(variant):
        def kern(wblk_ref, tab_ref, rel_ref, out_ref):
            def body(g, _):
                if variant == "store":
                    out_ref[pl.ds(g * 8, 8), :] = (
                        rel_ref[pl.ds(g * 8, 8), :] + g)
                    return 0
                if variant == "dynload":
                    win = tab_ref[pl.ds(wblk_ref[g] * 8, 8), :]
                    out_ref[pl.ds(g * 8, 8), :] = (
                        win + rel_ref[pl.ds(g * 8, 8), :])
                    return 0
                if variant == "gather":
                    r = rel_ref[pl.ds(g * 8, 8), :]
                    win = tab_ref[0:8, :]
                    out_ref[pl.ds(g * 8, 8), :] = jnp.take_along_axis(
                        win, jax.lax.rem(r, 128), axis=1)
                    return 0
                if variant == "static_iter":
                    out_ref[pl.ds(g * 8, 8), :] = (
                        rel_ref[pl.ds(g * 8, 8), :] * 2)
                    return 0
            jax.lax.fori_loop(0, Gb, body, 0)

        @jax.jit
        def run(wblkd, tabd, reld):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((Gb * 8, 128),
                                               jnp.int32),
            )(wblkd, tabd, reld)
        return run

    for v in ("store", "static_iter", "dynload", "gather"):
        run = mk(v)
        t = _time(run, wblk, tab, rel)
        print(f"[ovh] {v:<12s} {t:7.3f} ms  "
              f"{t*1e6/Gb:7.0f} ns/iter", flush=True)




def stability():
    for rep in range(5):
        hybrid_version()

