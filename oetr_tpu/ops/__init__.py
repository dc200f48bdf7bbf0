"""Compute ops: jnp reference implementations + Pallas TPU kernels."""
from .attention import elu_feature_map, full_attention, linear_attention
from .nms import (bilinear_sample, remove_borders, sample_descriptors,
                  simple_nms, topk_keypoints)
from .sinkhorn import extract_matches, log_optimal_transport, log_sinkhorn

__all__ = [
    "elu_feature_map", "full_attention", "linear_attention",
    "bilinear_sample", "remove_borders", "sample_descriptors", "simple_nms",
    "topk_keypoints", "extract_matches", "log_optimal_transport",
    "log_sinkhorn",
]
