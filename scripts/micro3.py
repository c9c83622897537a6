"""Round-2 micro-benchmarks: can we beat the ~15 ns/element XLA gather
floor that bounds the bucketed engine's expansion stage?

Candidates measured on the real chip (run ONE experiment at a time —
the TPU tunnel tolerates a single process):

  python scripts/micro3.py bitcast   # i32<->f64 bitcast feasibility
  python scripts/micro3.py dma       # Pallas per-entry span-copy DMA cost
  python scripts/micro3.py vgather   # Pallas VMEM vectorized gather
  python scripts/micro3.py take      # jnp.take of [T, L] rows vs L
  python scripts/micro3.py sort      # batched in-row sort payload costs

Timing follows scripts/micro2.py: chain ITERS data-dependent reps in one
jit, fetch a scalar, subtract null dispatch+fetch latency.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

ITERS = 8


def fetch_ms(fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)   # warm compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


_LAT = None


def null_latency():
    global _LAT
    if _LAT is None:
        f = jax.jit(lambda x: jnp.sum(x))
        _LAT = fetch_ms(f, jnp.ones((8,), jnp.float32))
        print(f"null dispatch+fetch latency: {_LAT:.1f} ms")
    return _LAT


# ---------------------------------------------------------------------------
def exp_bitcast():
    """Is bitcast_convert_type i32[...,2] <-> f64 usable on this backend?
    (Round-1 note: f64 can't cross the Pallas custom-call boundary, so the
    DMA plan transports f64 as int32 words and bitcasts back in XLA.)"""
    x = np.arange(1, 9, dtype=np.float64) * np.pi
    w = jnp.asarray(x.view(np.int32).reshape(8, 2))
    for name, fn in [
        ("i32[8,2] -> f64[8]",
         jax.jit(lambda v: jax.lax.bitcast_convert_type(v, jnp.float64))),
        ("f64[8] -> i32[8,2]",
         jax.jit(lambda v: jax.lax.bitcast_convert_type(v, jnp.int32))),
        ("i32[8] -> f32[8]",
         jax.jit(lambda v: jax.lax.bitcast_convert_type(v[:, 0],
                                                        jnp.float32))),
    ]:
        try:
            arg = jnp.asarray(x) if name.startswith("f64") else w
            out = np.asarray(fn(arg))
            if name.startswith("i32[8,2]"):
                ok = np.array_equal(out, x)
            elif name.startswith("f64"):
                ok = np.array_equal(out, x.view(np.int32).reshape(8, 2))
            else:
                ok = True
            print(f"{name:24s}: OK exact={ok}")
        except Exception as e:
            print(f"{name:24s}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


# ---------------------------------------------------------------------------
def _span_copy_call(E, L, ND, AREA, lag=8, grid_blocks=1):
    """Build a pallas_call copying E spans of L int32s data->out at
    prefetched offsets (HBM->HBM DMA per span)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    EPB = E // grid_blocks

    def kernel(srcr, dstr, data_ref, out_ref, sems):
        blk = pl.program_id(0) * EPB

        def get_dma(i):
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(srcr[i], L)],
                out_ref.at[pl.ds(dstr[i], L)],
                sems.at[i % lag])

        def body(i, _):
            @pl.when(i >= blk + lag)
            def _():
                get_dma(i - lag).wait()
            get_dma(i).start()
            return 0

        jax.lax.fori_loop(blk, blk + EPB, body, 0)

        def tail(j, _):
            get_dma(j).wait()
            return 0

        jax.lax.fori_loop(blk + max(EPB - lag, 0), blk + EPB, tail, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((lag,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((AREA,), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def exp_dma():
    """Per-entry async-copy cost: E spans of L int32 HBM->HBM."""
    rng = np.random.default_rng(0)
    null_latency()
    for L in (8, 32, 128, 512, 2048):
        E = min(1 << 16, (1 << 23) // L)
        ND = AREA = E * L
        # dst: permutation of aligned span starts; src: arbitrary offsets
        dst = rng.permutation(E).astype(np.int32) * L
        src = rng.integers(0, ND - L, E, endpoint=False).astype(np.int32)
        data = rng.integers(0, 1 << 30, ND).astype(np.int32)
        call = _span_copy_call(E, L, ND, AREA)

        @jax.jit
        def chained(src, dst, data):
            out = data
            for _ in range(ITERS):
                out = call(src, dst, out)
            return out[0]

        try:
            total = fetch_ms(chained, jnp.asarray(src), jnp.asarray(dst),
                             jnp.asarray(data))
            per = (total - null_latency()) / ITERS
            print(f"L={L:5d} E={E:6d}: {per:8.2f} ms "
                  f"-> {per * 1e6 / E:7.0f} ns/DMA "
                  f"{per * 1e6 / (E * L):7.2f} ns/elem")
        except Exception as e:
            print(f"L={L:5d}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
    # unaligned destination: same size, every offset +1
    L, E = 128, 1 << 14
    ND = AREA = E * L + 64
    dst = (rng.permutation(E).astype(np.int32) * L) + 1
    src = rng.integers(0, ND - L, E, endpoint=False).astype(np.int32)
    data = rng.integers(0, 1 << 30, ND).astype(np.int32)
    call = _span_copy_call(E, L, ND, AREA)

    @jax.jit
    def chained2(src, dst, data):
        out = data
        for _ in range(ITERS):
            out = call(src, dst, out)
        return out[0]

    try:
        total = fetch_ms(chained2, jnp.asarray(src), jnp.asarray(dst),
                         jnp.asarray(data))
        per = (total - null_latency()) / ITERS
        print(f"L={L:5d} UNALIGNED dst+1: {per:8.2f} ms "
              f"-> {per * 1e6 / E:7.0f} ns/DMA")
    except Exception as e:
        print(f"UNALIGNED: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")


# ---------------------------------------------------------------------------
def exp_vgather():
    """Vectorized gather from a VMEM-resident table inside a Pallas
    kernel — if Mosaic lowers it, small-B expansion skips DMA entirely."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, G = 1 << 20, 1 << 20          # 4 MB table, 1M lookups
    rng = np.random.default_rng(1)
    table = rng.integers(0, 1 << 30, T).astype(np.int32)
    idx = rng.integers(0, T, G).astype(np.int32)

    variants = {}

    def k_take(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    variants["jnp.take flat"] = k_take

    def k_index(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[i_ref[:]]

    variants["ref[idx] flat"] = k_index

    for name, kern in variants.items():
        try:
            call = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((G,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )

            @jax.jit
            def chained(t, i):
                o = i
                for _ in range(ITERS):
                    o = call(t, o & (T - 1))
                return o[0]

            total = fetch_ms(chained, jnp.asarray(table), jnp.asarray(idx))
            per = (total - null_latency()) / ITERS
            print(f"{name:20s}: {per:8.2f} ms -> "
                  f"{per * 1e6 / G:6.2f} ns/elem")
        except Exception as e:
            print(f"{name:20s}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")


# ---------------------------------------------------------------------------
def exp_take():
    """XLA jnp.take of whole [L]-rows from a [T, L] table: ns/elem vs L
    (round 1 measured 0.014 ns/elem at L=16384; how fast is it small?)"""
    null_latency()
    rng = np.random.default_rng(2)
    for L in (8, 16, 32, 64, 128, 256, 1024, 4096, 16384):
        G = min(1 << 17, (1 << 24) // L)
        T = max(G, 1024)
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (T, L)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, T, G).astype(np.int32))

        @jax.jit
        def chained(t, i):
            acc = jnp.zeros((), jnp.int32)
            for _ in range(ITERS):
                r = jnp.take(t, i, axis=0)
                acc = acc + r[0, 0]
                i = (i + r[:, 0]) % T        # data dependence
            return acc

        total = fetch_ms(chained, table, idx)
        per = (total - null_latency()) / ITERS
        print(f"L={L:6d} G={G:7d}: {per:8.2f} ms -> "
              f"{per * 1e6 / (G * L):7.3f} ns/elem "
              f"{per * 1e6 / G:7.1f} ns/row")


# ---------------------------------------------------------------------------
def exp_sort():
    """Batched in-row sort: ns/slot for the payload combos the engine
    uses (i32 key + f32 / f64 / 2xi32 payloads)."""
    null_latency()
    rng = np.random.default_rng(3)
    N = 1 << 23
    for W in (128, 1024, 4096):
        R = N // W
        k = jnp.asarray(rng.integers(0, 1 << 30, (R, W)).astype(np.int32))
        pf32 = jnp.asarray(rng.standard_normal((R, W)).astype(np.float32))
        pf64 = jnp.asarray(rng.standard_normal((R, W)))
        pi32 = jnp.asarray(rng.integers(0, 1 << 30, (R, W)).astype(np.int32))

        for name, payload in [("f32", (pf32,)), ("f64", (pf64,)),
                              ("2xi32", (pi32, pi32))]:
            @jax.jit
            def chained(k, *ps):
                for _ in range(ITERS):
                    out = jax.lax.sort((k, *ps), num_keys=1, dimension=1)
                    k = out[0]
                    ps = out[1:]
                return k[0, 0]

            total = fetch_ms(chained, k, *payload)
            per = (total - null_latency()) / ITERS
            print(f"W={W:5d} key+{name:5s}: {per:8.2f} ms -> "
                  f"{per * 1e6 / N:6.2f} ns/slot")


EXPS = {"bitcast": exp_bitcast, "dma": exp_dma, "vgather": exp_vgather,
        "take": exp_take, "sort": exp_sort}

if __name__ == "__main__":
    names = sys.argv[1:] or list(EXPS)
    print(f"backend: {jax.default_backend()}  devices: "
          f"{len(jax.devices())}")
    for n in names:
        print(f"=== {n} ===")
        EXPS[n]()
