"""Pallas async-remote-copy halo exchange (ops/remote_fetch.py) on the
virtual CPU mesh, interpret mode (SURVEY.md §5.8 backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mh_spgemm_tpu import SpGEMMConfig, oracle_spgemm
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.ops import remote_fetch
from mh_spgemm_tpu.parallel.mesh import ROWS, make_row_mesh
from mh_spgemm_tpu.parallel.spgemm_dist import spgemm_dist


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_row_mesh(n)


@pytest.mark.parametrize("d", [1, 4, 8])
def test_halo_exchange_matches_all_to_all(d):
    """Double-buffered direct-send exchange == lax.all_to_all."""
    mesh = _mesh(d)
    rng = np.random.default_rng(5)
    x = rng.integers(-2**30, 2**30,
                     size=(d, d, 3, 128)).astype(np.int32)
    xs = jax.device_put(x, NamedSharding(mesh, P(ROWS)))

    fn = jax.jit(jax.shard_map(
        lambda s: remote_fetch.halo_exchange(
            s[0], axis=ROWS, n_devices=d, interpret=True)[None],
        mesh=mesh, in_specs=(P(ROWS),), out_specs=P(ROWS),
        check_vma=False))
    out = np.asarray(fn(xs))
    np.testing.assert_array_equal(out, np.swapaxes(x, 0, 1))


def test_exchange_planes_unaligned_cap():
    """Several word planes, cap not a multiple of 128, one DMA per
    destination: packed/unpacked planes round-trip exactly."""
    d = 4
    mesh = _mesh(d)
    rng = np.random.default_rng(9)
    cap = 300                                   # not 128-aligned
    planes = [rng.integers(-2**30, 2**30, size=(d, d, cap)).astype(
        np.int32) for _ in range(3)]
    shards = [jax.device_put(p, NamedSharding(mesh, P(ROWS)))
              for p in planes]

    def body(*ps):
        outs = remote_fetch.exchange_planes(
            [p[0] for p in ps], axis=ROWS, n_devices=d, interpret=True)
        return tuple(o[None] for o in outs)

    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(P(ROWS),) * 3,
                               out_specs=(P(ROWS),) * 3,
                               check_vma=False))
    outs = fn(*shards)
    for p, o in zip(planes, outs):
        np.testing.assert_array_equal(np.asarray(o),
                                      np.swapaxes(p, 0, 1))


def test_dist_ragged_pallas_comm_matches_oracle():
    """The full ragged strategy with the explicit-RDMA transport
    (config.comm_backend='pallas') against the oracle, fill on."""
    mesh = _mesh(4)
    cfg = SpGEMMConfig(dma_fill="interpret", comm_backend="pallas")
    for A in (gen.banded(120, band=9, nnz_per_row=5, seed=21),
              gen.powerlaw(300, avg_nnz=5, seed=22)):
        C = spgemm_dist(A, None, mesh, config=cfg, b_strategy="ragged")
        assert C.equals(oracle_spgemm(A, A), tol=1e-9)
