"""Pallas block-gather: fetch whole 128x128 blocks by index, one DMA per
block, via a scalar-prefetched BlockSpec index map (the canonical Mosaic
sparse-access pattern).

MEASURED OUTCOME (v5e, 4096 blocks of 64 KB): this kernel runs at
0.10 ns/element — 80x better than *element*-granularity XLA gathers — but
XLA's ``jnp.take(table, idx, axis=0)`` on the same block table runs at
0.014 ns/element (0.9 ms vs 6.9 ms): when the gathered rows are whole
contiguous 64 KB blocks, XLA already emits bandwidth-rate dynamic DMAs,
and the Mosaic grid's ~1.7 us/step overhead dominates.  The block-dense
engine therefore uses plain ``take`` for standalone gathers; the place a
Pallas kernel WINS is fusion: :func:`pair_matmul_f32` streams operand
blocks through VMEM, runs the MXU matmul, and accumulates per C block in
VMEM scratch — removing the [npairs, 128, 128] HBM intermediate that the
XLA gather + batched-matmul + segmented-sum pipeline materialises.  It
drives the f32 block-dense path (ops/blockdense.py).  Benchmarks:
scripts/proto_ragged.py, scripts/micro2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _gather_kernel(idx_ref, src_ref, out_ref):
    out_ref[...] = src_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_gather(table: jax.Array, idx: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """``table[idx]`` for ``table`` of shape [T, BS1, BS2]: one DMA per
    block instead of BS1*BS2 element loads."""
    G = idx.shape[0]
    T, b1, b2 = table.shape
    z = np.int32(0)  # index maps must be uniformly 32-bit under x64 mode
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, b1, b2), lambda i, idx_ref:
                               (idx_ref[i], z, z))],
        out_specs=pl.BlockSpec((1, b1, b2), lambda i, idx_ref: (i, z, z)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, b1, b2), table.dtype),
        interpret=interpret,
    )(idx, table)


def block_gather_any(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Block gather via Pallas on TPU, XLA take elsewhere.

    64-bit payloads can't pass through a TPU custom call (XLA's x64
    rewrite has no rule for it), so f64/i64 tables are moved as int32
    pairs — a DMA is dtype-blind."""
    if not _on_tpu():
        return jnp.take(table, idx, axis=0)
    if table.dtype.itemsize == 8:
        T, b1, b2 = table.shape
        as32 = jax.lax.bitcast_convert_type(
            table, jnp.int32).reshape(T, b1, 2 * b2)
        out = block_gather(as32, idx)
        return jax.lax.bitcast_convert_type(
            out.reshape(idx.shape[0], b1, b2, 2), table.dtype)
    return block_gather(table, idx)


def _pair_matmul_kernel(pa_ref, pb_ref, cb_ref, w_ref, a_ref, b_ref,
                        out_ref, acc_ref):
    """Fused pair-stream block matmul with in-VMEM segment accumulation:
    pairs arrive sorted by destination C block; the output index map
    revisits the same block for a whole segment, so the accumulator lives
    in VMEM and the pipeline flushes it to HBM when cb changes — operand
    fetch, MXU matmul and segment reduction in one kernel, zero
    intermediate HBM traffic (vs. gather + batched-matmul + segmented-sum
    as three XLA passes)."""
    i = pl.program_id(0)
    first = jnp.where(i == 0, True,
                      cb_ref[i] != cb_ref[jnp.maximum(i - 1, 0)])

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[i].astype(jnp.float32)
    acc_ref[...] += w * jnp.dot(a_ref[0], b_ref[0],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("ncb", "interpret"))
def pair_matmul_f32(a_dense, b_dense, pair_a, pair_b, pair_cb, live,
                    ncb: int, interpret: bool = False):
    """All-pairs ``A[pa[g]] @ B[pb[g]]`` accumulated per C block (f32).

    ``pair_cb`` must be nondecreasing (pairs sorted by C block); ``live``
    masks padding pairs.  Returns [ncb, BS, BS] accumulated blocks.
    f32 only: 64-bit types cannot cross the Mosaic custom-call boundary
    (the f64 path uses XLA batched matmuls instead).
    """
    G = pair_a.shape[0]
    _, b1, b2 = a_dense.shape
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,       # pa, pb, cb, live — scalars first
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, b1, b1),
                         lambda i, pa, pb, cb, w: (pa[i], z, z)),
            pl.BlockSpec((1, b1, b2),
                         lambda i, pa, pb, cb, w: (pb[i], z, z)),
        ],
        out_specs=pl.BlockSpec((1, b1, b2),
                               lambda i, pa, pb, cb, w: (cb[i], z, z)),
        scratch_shapes=[pltpu.VMEM((b1, b2), jnp.float32)],
    )
    return pl.pallas_call(
        _pair_matmul_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncb, b1, b2), jnp.float32),
        # the grid walks segments in order and revisits output blocks:
        # the dimension must be sequential ("arbitrary"), not parallel
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pair_a, pair_b, pair_cb, live.astype(jnp.int32), a_dense, b_dense)
