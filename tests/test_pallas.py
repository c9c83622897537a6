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
