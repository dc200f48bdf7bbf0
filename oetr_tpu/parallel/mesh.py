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


# ---------------------------------------------------------------------------
# Tensor-parallel / FSDP partition rules
# ---------------------------------------------------------------------------
#
# The reference's only parallelism is DDP (train.py:73-74). The TPU build
# adds first-class tensor parallelism over a 'model' mesh axis (Megatron
# layout on the transformer: column-split QKV/fc1, row-split merge/fc2 so
# each block needs exactly one psum, inserted by XLA from the shardings)
# and FSDP over an 'fsdp' axis for everything without a TP rule
# (SURVEY.md §2.7 "TP/FSDP axes").

#: (regex on the flattened param path, PartitionSpec) — first match wins.
#: Paths look like "transformer/enc_self_0/q_proj/kernel".
OETR_PARTITION_RULES: list[tuple[str, P]] = [
    # Attention in/out projections (encoder + decoder MHA).
    (r"[qkv]_proj/kernel$", P(None, "model")),
    (r"[qkv]_proj/bias$", P("model")),
    (r"merge/kernel$", P("model", None)),
    # Transformer MLPs: Dense_0 = fc1 (column), Dense_1 = fc2 (row).
    (r"Dense_0/kernel$", P(None, "model")),
    (r"Dense_1/kernel$", P("model", None)),
]


def _spec_fits(shape: tuple[int, ...], spec: P, mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, names in zip(shape, spec):
        if names is None:
            continue
        names = (names,) if isinstance(names, str) else names
        size = int(np.prod([mesh.shape[n] for n in names]))
        if dim % size != 0:
            return False
    return True


def _fsdp_spec(shape: tuple[int, ...], axis: str, mesh: Mesh,
               min_size: int = 2) -> P:
    """Shard the largest divisible dim over ``axis`` (ZeRO-3 layout)."""
    size = mesh.shape[axis]
    best = None
    for i, dim in enumerate(shape):
        if dim >= min_size and dim % size == 0:
            if best is None or dim > shape[best]:
                best = i
    if best is None:
        return P()
    return P(*(axis if i == best else None for i in range(len(shape))))


def param_shardings(params, mesh: Mesh,
                    rules: Sequence[tuple[str, P]] | None = None,
                    fsdp_axis: str | None = None):
    """Pytree of NamedShardings for a param/opt-state pytree.

    Each leaf's flattened path is matched against ``rules`` (first match
    wins; a rule naming a mesh axis absent from ``mesh`` or not dividing
    the dim falls through). Unmatched leaves are FSDP-sharded over
    ``fsdp_axis`` when given, else replicated. Works on optimizer state
    too (adam mu/nu mirror the param tree, so paths match the same rules).
    """
    import re

    rules = list(rules if rules is not None else OETR_PARTITION_RULES)

    def leaf_sharding(path, leaf):
        pathstr = "/".join(
            str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
            for k in path)
        shape = getattr(leaf, "shape", ())
        for pat, spec in rules:
            if re.search(pat, pathstr):
                axes = [a for ax in spec if ax is not None
                        for a in ((ax,) if isinstance(ax, str) else ax)]
                if all(a in mesh.shape for a in axes) and \
                        _spec_fits(shape, spec, mesh):
                    return NamedSharding(mesh, spec)
                break
        if fsdp_axis is not None and fsdp_axis in mesh.shape and shape:
            return NamedSharding(mesh, _fsdp_spec(shape, fsdp_axis, mesh))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)
