"""Pallas inter-chip halo exchange: the ``all_to_all`` of the ragged
B-fetch as explicit double-buffered async remote copies (SURVEY.md §5.8:
remote fetch via ``pltpu.make_async_remote_copy``; the reference's
single-GPU engine has no analogue — this is the TPU-native ICI/DCN
backend mandated for the distributed halo strategy).

Schedule: with D devices, step k (k = 1..D-1) sends my block destined
for device (me + k) straight to that device's receive slot ``me`` —
direct sends, not a store-and-forward ring, so each payload crosses the
interconnect exactly once (an all_to_all, not an all_gather).  The copy
for step k+1 is STARTED before the wait on step k (two DMA-semaphore
slots), so there is always one transfer in flight while the previous
one drains — the double-buffered fetch pattern.

Scheduling note (honest): a Pallas kernel occupies the compute core for
its duration, so THIS kernel overlaps its own sends/receives with each
other, not with unrelated XLA compute.  The ragged_overlap strategy
(parallel/spgemm_dist.py) therefore keeps ``lax.all_to_all`` — which
XLA runs on the async collective streams concurrently with the
local-row stage — as its default transport, and this kernel is the
explicit-RDMA backend (``SpGEMMConfig.comm_backend = 'pallas'``) for
meshes where XLA's collective scheduling is the bottleneck.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _exchange_kernel(axis: str, nd_static: int, send_ref, recv_ref,
                     send_sem, recv_sem):
    me = jax.lax.axis_index(axis).astype(jnp.int32)
    nd = jnp.int32(nd_static)

    # my own block never crosses the interconnect
    recv_ref[me] = send_ref[me]

    def op(k, slot):
        dst = jax.lax.rem(me + k, nd)
        # SPMD-symmetric: my step-k target expects my payload in ITS
        # receive slot ``me``; its own step-k send signals MY recv_sem
        # at the same slot index, so wait() syncs both directions.
        return pltpu.make_async_remote_copy(
            src_ref=send_ref.at[dst],
            dst_ref=recv_ref.at[me],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    if nd_static > 1:
        op(jnp.int32(1), jnp.int32(0)).start()
    for k in range(1, nd_static):
        if k + 1 < nd_static:            # double buffer: next in flight
            op(jnp.int32(k + 1), jnp.int32((k + 1) % 2)).start()
        op(jnp.int32(k), jnp.int32(k % 2)).wait()


@functools.partial(jax.jit,
                   static_argnames=("axis", "n_devices", "interpret"))
def halo_exchange(send: jax.Array, *, axis: str, n_devices: int,
                  interpret: bool = False) -> jax.Array:
    """All-to-all of ``send`` i32[D, vr, 128] (block d = payload for
    device d) via direct async remote copies; returns i32[D, vr, 128]
    with slot s = the block device s sent here.  Must be called inside
    ``shard_map`` over ``axis``.  Equivalent to
    ``lax.all_to_all(send, axis, 0, 0)`` — tested against it."""
    D, vr, lanes = send.shape
    assert lanes == 128 and D == n_devices, send.shape
    return pl.pallas_call(
        functools.partial(_exchange_kernel, axis, n_devices),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((D, vr, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(collective_id=13),
        interpret=interpret,
    )(send)


def exchange_planes(planes, *, axis: str, n_devices: int,
                    interpret: bool = False):
    """Exchange several same-shape i32[D, cap] word planes (columns +
    value words) in ONE kernel call: planes are packed side by side into
    the [D, vr, 128] transport layout so each destination costs a single
    remote DMA instead of one per plane.  Returns the received planes,
    each i32[D, cap]."""
    D = n_devices
    cap = planes[0].shape[1]
    vr1 = -(-cap // 128)                    # rows per plane, 128-padded
    P = len(planes)

    def pack(p):
        flat = p.astype(jnp.int32).reshape(D, cap)
        pad = vr1 * 128 - cap
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad)))
        return flat.reshape(D, vr1, 128)

    send = jnp.concatenate([pack(p) for p in planes], axis=1)
    recv = halo_exchange(send, axis=axis, n_devices=D,
                         interpret=interpret)
    outs = []
    for i in range(P):
        blk = recv[:, i * vr1:(i + 1) * vr1, :]
        outs.append(blk.reshape(D, vr1 * 128)[:, :cap])
    return outs
