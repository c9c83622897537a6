"""Microbenchmarks of candidate TPU primitives for the SpGEMM pipeline.

Run on the real chip to decide numeric-stage strategy:
  python scripts/micro.py [P] [NNZC]
"""
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

P = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
NNZC = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:10.3f} ms")
    return dt


key = jax.random.PRNGKey(0)
dst = jax.random.randint(key, (P,), 0, NNZC, dtype=jnp.int32)
v32 = jax.random.uniform(key, (P,), dtype=jnp.float32)
v64 = v32.astype(jnp.float64)
rows = jnp.sort(jax.random.randint(key, (P,), 0, 1 << 20, dtype=jnp.int32))
cols = jax.random.randint(key, (P,), 0, 1 << 22, dtype=jnp.int32)
idx = jax.random.randint(key, (P,), 0, P, dtype=jnp.int32)
flags = jax.random.bernoulli(key, 0.3, (P,))

print(f"P={P} NNZC={NNZC}")

bench("scatter-add f32 P->NNZC", jax.jit(
    lambda d, v: jnp.zeros(NNZC, jnp.float32).at[d].add(v)), dst, v32)
bench("scatter-add f64 P->NNZC", jax.jit(
    lambda d, v: jnp.zeros(NNZC, jnp.float64).at[d].add(v)), dst, v64)
bench("segment_sum sorted f64", jax.jit(
    lambda d, v: jax.ops.segment_sum(v, d, NNZC, indices_are_sorted=True)),
    jnp.sort(dst), v64)
bench("sort 1key i32", jax.jit(lambda c: jnp.sort(c)), cols)
bench("sort 2key+carry i32x3", jax.jit(
    lambda r, c, i: jax.lax.sort((r, c, i), num_keys=2)), rows, cols, idx)
bench("sort 1key+carry i32x2", jax.jit(
    lambda c, i: jax.lax.sort((c, i), num_keys=1)), cols, idx)
bench("cumsum i32", jax.jit(lambda x: jnp.cumsum(x)), cols)
bench("cumsum f64", jax.jit(lambda x: jnp.cumsum(x)), v64)
bench("gather f64 P", jax.jit(lambda i, v: v[i]), idx, v64)
bench("gather i32 P", jax.jit(lambda i, v: v[i]), idx, cols)

def seg_scan_hs(flags, v, passes=6):
    f = flags
    for k in range(passes):
        d = 1 << k
        sv = jnp.concatenate([jnp.zeros(d, v.dtype), v[:-d]])
        sf = jnp.concatenate([jnp.ones(d, bool), f[:-d]])
        v = jnp.where(f, v, sv + v)
        f = f | sf
    return v

bench("segscan HS f64 6pass", jax.jit(seg_scan_hs), flags, v64)
bench("segscan HS f32 6pass", jax.jit(seg_scan_hs), flags, v32)

def assoc_segscan(flags, v):
    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)
    return jax.lax.associative_scan(comb, (flags, v))

bench("assoc segscan f64", jax.jit(assoc_segscan), flags, v64)

m32 = dst.astype(jnp.uint32)
bench("popcount u32", jax.jit(lambda x: jax.lax.population_count(x)), m32)
bench("repeat total", jax.jit(
    lambda l: jnp.repeat(jnp.arange(NNZC, dtype=jnp.int32), l,
                         total_repeat_length=P)),
    jnp.full((NNZC,), P // NNZC, jnp.int32))
bench("searchsorted P in NNZC", jax.jit(
    lambda h, q: jnp.searchsorted(h, q)), jnp.sort(dst), cols % NNZC)
# mul f64 throughput
bench("mul f64 P", jax.jit(lambda a, b: a * b), v64, v64)
bench("scatter-set unique i32", jax.jit(
    lambda v: jnp.zeros(P, jnp.int32).at[
        jnp.arange(P, dtype=jnp.int32)].set(v)), cols)
