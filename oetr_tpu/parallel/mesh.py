"""Device mesh construction + sharding helpers.

The TPU-native replacement for the reference's NCCL/DDP stack
(/root/reference/train.py:60,73-74): a `jax.sharding.Mesh` over ICI/DCN
with named axes, `NamedSharding` annotations on batches and parameters,
and XLA-inserted collectives (SURVEY.md §2.7). Data parallelism is the
baseline axis; the helpers accept extra model axes for tensor/FSDP
sharding of the transformer blocks.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Mapping[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a mesh; default = all devices on a single 'data' axis.

    ``axis_sizes`` maps axis name -> size in declaration order, e.g.
    ``{"data": 4, "model": 2}``; -1 means "fill with remaining devices".
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    names = list(axis_sizes)
    sizes = [axis_sizes[n] for n in names]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {len(devices)}")
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split along the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters in pure-DP training)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array of a pytree batch with its leading dim sharded."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
