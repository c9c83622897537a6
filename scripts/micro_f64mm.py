"""Microbench: XLA emulated-f64 batched matmul vs f32 vs bf16 on the chip.

Sizes the win available to an Ozaki-style exact-slice f64 pair-matmul
(VERDICT round-2 missing #1): if emulated f64 costs >> ~21x a bf16
matmul, the slice decomposition pays.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import mh_spgemm_tpu  # noqa: F401  (x64 on)

BS = 128
G = 512


def bench(dtype, iters=10):
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (G, BS, BS), jnp.float32).astype(dtype)
    b = jax.random.normal(k, (G, BS, BS), jnp.float32).astype(dtype)

    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)

    r = f(a, b)
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(a, b)
    r.block_until_ready()
    ms = (time.perf_counter() - t0) / iters * 1e3
    flops = 2 * G * BS**3
    return ms, flops / ms / 1e6  # GFLOPS


if __name__ == "__main__":
    print("devices:", jax.devices())
    for dt in (jnp.bfloat16, jnp.float32, jnp.float64):
        ms, gf = bench(dt)
        print(f"{np.dtype(dt).name:10s} {ms:9.3f} ms  {gf:10.1f} GFLOPS")
