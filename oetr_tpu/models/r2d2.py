"""R2D2 keypoint network in flax.linen (from scratch).

Reference surface: wrapper conf with reliability/repeatability thresholds
and top-5000 multiscale extraction (/root/reference/dloc/core/extractors/
r2d2.py:23-87; extract_features.py:73-85). Implemented from the published
architecture (Revaud et al., "R2D2: Repeatable and Reliable Detector and
Descriptor"): an L2-Net-style fully-convolutional trunk with dilated
convolutions (full input resolution preserved), emitting a 128-d
L2-normalized descriptor field plus per-pixel repeatability and
reliability maps; keypoints = NMS on repeatability, gated by both
thresholds.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.nms import sample_descriptors, simple_nms, topk_keypoints

Array = jnp.ndarray

# (features, kernel, dilation) — dilated L2-Net trunk, stride 1 everywhere.
TRUNK = ((32, 3, 1), (32, 3, 1), (64, 3, 1), (64, 3, 2), (128, 3, 2),
         (128, 3, 4))


class R2D2Trunk(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, (c, k, d) in enumerate(TRUNK):
            x = nn.Conv(c, (k, k), kernel_dilation=(d, d), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, c), dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.Conv(128, (2, 2), padding="SAME", dtype=self.dtype,
                       name="proj")(x)


class R2D2(nn.Module):
    """Full extractor (conf parity: extract_features.py:73-85)."""
    reliability_thr: float = 0.7
    repeatability_thr: float = 0.7
    max_keypoints: int = 5000          # 'topk'
    nms_radius: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array) -> dict:
        """image: [B, H, W, 3] in [0, 1]."""
        feats = R2D2Trunk(self.dtype, name="trunk")(image.astype(self.dtype))
        f32 = feats.astype(jnp.float32)
        desc_map = f32 / jnp.maximum(
            jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)

        # Repeatability: softmax over a local window of the squared
        # response (peakiness); reliability: per-pixel discriminativeness.
        sq = jnp.sum(f32 ** 2, axis=-1)
        rep_logits = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                             name="repeatability")(f32)[..., 0]
        rel_logits = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                             name="reliability")(f32)[..., 0]
        repeatability = nn.sigmoid(rep_logits + 0.01 * sq)
        reliability = nn.sigmoid(rel_logits)

        score = repeatability * jnp.where(
            reliability > self.reliability_thr, 1.0, 0.0)
        nmsed = simple_nms(score, self.nms_radius)
        xy, s, valid = topk_keypoints(nmsed, self.max_keypoints,
                                      self.repeatability_thr,
                                      nms_tile=self.nms_radius + 1)
        descs = sample_descriptors(desc_map, xy, stride=1)
        return {"keypoints": xy, "scores": s, "valid": valid,
                "descriptors": descs, "dense_scores": score,
                "reliability": reliability, "repeatability": repeatability}
