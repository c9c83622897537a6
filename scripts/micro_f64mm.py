"""Microbench: XLA emulated-f64 batched matmul vs f32 vs bf16 on the chip.

Sizes the win available to an Ozaki-style exact-slice f64 pair-matmul
(VERDICT round-2 missing #1): if emulated f64 costs >> ~21x a bf16
matmul, the slice decomposition pays.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import mh_spgemm_tpu  # noqa: F401  (x64 on)

BS = 128
G = 512


def bench(dtype, iters=100):
    a = (jax.random.normal(jax.random.PRNGKey(0), (G, BS, BS),
                           jnp.float32) * 1e-3).astype(dtype)
    b = (jax.random.normal(jax.random.PRNGKey(1), (G, BS, BS),
                           jnp.float32) * 1e-3).astype(dtype)

    @jax.jit
    def f(a, b):
        r = jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)
        return r, jnp.sum(r[:, 0, 0])

    # block_until_ready is a no-op through the axon relay: fence with a
    # tiny fetch, chain iterations so nothing can be elided (measured
    # v5e: bf16 0.42 ms, f32 0.50 ms, emulated f64 18.6 ms per call)
    r, s = f(a, b)
    float(s)
    t0 = time.perf_counter()
    r = a
    for _ in range(iters):
        r, s = f(r, b)
    float(s)
    ms = (time.perf_counter() - t0) / iters * 1e3
    flops = 2 * G * BS**3
    return ms, flops / ms / 1e6  # GFLOPS


if __name__ == "__main__":
    print("devices:", jax.devices())
    for dt in (jnp.bfloat16, jnp.float32, jnp.float64):
        ms, gf = bench(dt)
        print(f"{np.dtype(dt).name:10s} {ms:9.3f} ms  {gf:10.1f} GFLOPS")
