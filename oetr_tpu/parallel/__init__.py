"""Parallelism layer: mesh construction, shardings, ring attention."""
from .mesh import (OETR_PARTITION_RULES, data_sharding, make_mesh,
                   param_shardings, replicated, shard_batch)
from .ring_attention import ring_attention

__all__ = ["OETR_PARTITION_RULES", "data_sharding", "make_mesh",
           "param_shardings", "replicated", "shard_batch", "ring_attention"]
