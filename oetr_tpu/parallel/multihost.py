"""Multi-host (multi-process) runtime: the TPU answer to NCCL rendezvous.

The reference bootstraps multi-GPU training with
``torch.distributed.init_process_group('nccl', init_method='env://')``
(/root/reference/train.py:60) plus ``torch.distributed.launch``. On TPU
pods the equivalent is ``jax.distributed.initialize`` — after it, every
process sees the *global* device set and a single ``Mesh`` laid out so
the 'data' (DCN) axis crosses hosts while model axes stay inside a host
(ICI), and XLA routes collectives accordingly.

``shard_batch_global`` is the multi-process-safe version of
``mesh.shard_batch``: each process contributes its local batch shard and
gets back a global jax.Array (single-process it degrades to device_put).
"""
from __future__ import annotations

import os
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids: Sequence[int] | None = None
                           ) -> None:
    """Join the multi-process runtime (replaces init_process_group).

    All arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or,
    on real TPU pods, from the TPU metadata — matching the reference's
    ``init_method='env://'`` convention. No-op when num_processes is 1
    or the runtime is already initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes is not None and num_processes <= 1:
        return
    if num_processes is None and coordinator is None:
        return  # single-process run, nothing to join
    # NB: must run before anything touches the XLA backend (even
    # jax.devices()), so don't probe jax.process_count() here.
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:    # already initialized
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def make_global_mesh(axis_sizes: Mapping[str, int] | None = None) -> Mesh:
    """Mesh over the *global* device set, DCN-major.

    The leading axis (conventionally 'data') varies slowest, so
    consecutive blocks of the device list — one block per host when axes
    are sized host-aligned — land in the same row: data-parallel
    gradient psums cross DCN once while TP/FSDP collectives ride ICI
    within a host. This is the scaling-book layout (DP outermost).
    """
    from .mesh import make_mesh
    return make_mesh(axis_sizes or {"data": len(jax.devices())})


def shard_batch_global(batch, mesh: Mesh, axis: str = "data"):
    """Shard a host-local batch pytree into global arrays.

    Multi-process: every process passes its LOCAL slice of the global
    batch (global_batch = num_processes * local_batch, concatenated in
    process order along dim 0) — ``jax.make_array_from_process_local_data``
    assembles the global jax.Array. Single-process: plain device_put.
    """
    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
