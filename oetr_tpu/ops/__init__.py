"""Compute ops: jnp reference implementations + Pallas TPU kernels."""
from .attention import elu_feature_map, full_attention, linear_attention

__all__ = ["elu_feature_map", "full_attention", "linear_attention"]
