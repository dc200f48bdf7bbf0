"""Parallelism layer: mesh construction, shardings, ring attention."""
from .mesh import data_sharding, make_mesh, replicated, shard_batch
from .ring_attention import ring_attention

__all__ = ["data_sharding", "make_mesh", "replicated", "shard_batch",
           "ring_attention"]
