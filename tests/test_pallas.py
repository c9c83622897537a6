"""Pallas kernels (interpret mode on CPU; real Mosaic under
MHSPGEMM_TEST_TPU=1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mh_spgemm_tpu.ops.pallas_gather import block_gather


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def test_block_gather_matches_take():
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (16, 8, 128), jnp.float32)
    idx = jax.random.randint(key, (9,), 0, 16, dtype=jnp.int32)
    out = block_gather(table, idx, interpret=_interpret())
    ref = jnp.take(table, idx, axis=0)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_block_gather_repeated_indices():
    table = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128)
    idx = jnp.asarray([2, 2, 0, 3, 2], dtype=jnp.int32)
    out = block_gather(table, idx, interpret=_interpret())
    ref = jnp.take(table, idx, axis=0)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_pair_matmul_segments():
    from mh_spgemm_tpu.ops.pallas_gather import pair_matmul_f32
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (8, 128, 128), jnp.float32)
    pa = jnp.asarray([0, 1, 2, 3, 4, 5], jnp.int32)
    pb = jnp.asarray([1, 2, 3, 4, 5, 6], jnp.int32)
    cb = jnp.asarray([0, 0, 1, 1, 1, 2], jnp.int32)
    live = jnp.asarray([1, 1, 1, 1, 1, 0], bool)  # last pair masked
    out = pair_matmul_f32(table, table, pa, pb, cb, live, ncb=3,
                          interpret=_interpret())
    t = np.asarray(table)
    assert np.allclose(np.asarray(out[0]), t[0] @ t[1] + t[1] @ t[2],
                       rtol=1e-4)
    assert np.allclose(np.asarray(out[1]),
                       t[2] @ t[3] + t[3] @ t[4] + t[4] @ t[5], rtol=1e-4)
    assert np.allclose(np.asarray(out[2]), 0.0)   # masked pair -> zero
