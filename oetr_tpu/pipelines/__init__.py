"""Matching pipelines + public API (dloc parity)."""
from .api import (build_model, build_shipped_model, get_matches,
                  get_pose)
from .matching import (DensePipeline, PipelineConfig, SparsePipeline,
                       gate_boxes, overlap_scale_score)

__all__ = [
    "build_model", "build_shipped_model", "get_matches", "get_pose",
    "DensePipeline",
    "PipelineConfig", "SparsePipeline", "gate_boxes", "overlap_scale_score",
]
