"""Device-mesh construction for multi-chip / multi-host SpGEMM.

The reference is strictly single-GPU (SURVEY.md §2.3); scale-out is a new
capability: a 1-D logical mesh over the ``rows`` axis — A and C are
row-partitioned, B is replicated or row-sharded + gathered.  On hardware the
axis is laid out over ICI within a slice; across hosts jax's standard
multi-process runtime extends the same mesh over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ROWS = "rows"
COLS = "cols"


def make_row_mesh(n_devices: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the first n) devices, axis name 'rows'."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (ROWS,), devices=devs)


def make_grid_mesh(dr: int, dc: int,
                   devices: Optional[Sequence] = None) -> Mesh:
    """2-D (rows x cols) mesh for the block-partitioned strategy
    (BASELINE.json north star: "A row-partitioned and B
    block-partitioned"): C's rows shard over ``rows``, B's columns over
    ``cols``.  On hardware, lay ``cols`` over the minor ICI axis so the
    per-cols-group B gathers ride nearest-neighbour links."""
    devs = list(devices) if devices is not None else jax.devices()
    devs = devs[: dr * dc]
    return jax.make_mesh((dr, dc), (ROWS, COLS), devices=devs)


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROWS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Join a multi-host jax runtime (DCN spans hosts; ICI spans the chips
    within each host's slice).  After this, ``jax.devices()`` sees every
    chip in the job and :func:`make_row_mesh` lays the ``rows`` axis over
    all of them — host-local blocks exchange over ICI, cross-host over
    DCN, with no code changes in the SpGEMM engines.

    No-op when the runtime is already initialised or the job is
    single-process (all arguments None and no cluster env detected).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process
