"""ASLFeat-style extractor in flax.linen (from scratch).

The reference wraps a TensorFlow-1.15 model it cannot ship
(/root/reference/dloc/core/extractors/aslfeat.py:21-68, requirements.txt
pins TF1). Implemented here from the published design (Luo et al.,
"ASLFeat: Learning Local Features of Accurate Shape and Localization"):
an L2-Net-like trunk with multi-level feature aggregation and a
peakiness-based detection score computed at three levels (1, 1/2, 1/4)
then fused at full resolution. The deformable convolutions of the paper
are approximated by dilated convs (documented deviation — DCN has no
TPU-native lowering; the accuracy-relevant multi-level peakiness scoring
is faithful).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import sample_descriptors, simple_nms, topk_keypoints

Array = jnp.ndarray


def peakiness_score(f: Array) -> Array:
    """ASLFeat peakiness: softplus(f - avg_spatial) * softplus(f - avg_channel),
    max over channels. f: [B, H, W, C] -> [B, H, W]."""
    spatial_avg = jax.lax.reduce_window(
        f, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME") / 9.0
    channel_avg = jnp.mean(f, axis=-1, keepdims=True)
    alpha = jax.nn.softplus(f - spatial_avg)
    beta = jax.nn.softplus(f - channel_avg)
    return jnp.max(alpha * beta, axis=-1)


class ASLFeat(nn.Module):
    """Multi-level detect-and-describe (conf parity:
    extract_features.py:86-94: max_keypoints 2048, grayscale input)."""
    max_keypoints: int = 2048
    nms_radius: int = 2
    keypoint_threshold: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array) -> dict:
        """image: [B, H, W, 1] grayscale in [0, 1] (H, W divisible by 4)."""
        x = image.astype(self.dtype)

        def block(x, c, stride=1, dilation=1, name=""):
            x = nn.Conv(c, (3, 3), strides=(stride, stride),
                        kernel_dilation=(dilation, dilation), padding="SAME",
                        dtype=self.dtype, name=name)(x)
            x = nn.GroupNorm(num_groups=min(8, c), dtype=self.dtype)(x)
            return nn.relu(x)

        x1 = block(x, 32, name="c1a")
        x1 = block(x1, 32, name="c1b")                    # level 1 (1/1)
        x2 = block(x1, 64, stride=2, name="c2a")
        x2 = block(x2, 64, name="c2b")                    # level 2 (1/2)
        x3 = block(x2, 128, stride=2, name="c3a")
        x3 = block(x3, 128, dilation=2, name="c3b")       # level 3 (1/4)
        desc = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                       name="desc")(x3)
        desc = desc.astype(jnp.float32)
        desc_map = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

        b, h, w, _ = x1.shape
        scores = []
        for lvl, (feat, s) in enumerate([(x1, 1), (x2, 2), (x3, 4)]):
            sc = peakiness_score(feat.astype(jnp.float32))
            if s > 1:
                sc = jax.image.resize(sc, (b, h, w), "bilinear")
            scores.append(sc)
        # Multi-level fusion (paper: weighted sum, weights 1/2/3).
        weights = jnp.asarray([1.0, 2.0, 3.0])
        score = sum(wt * sc for wt, sc in zip(weights, scores)) / weights.sum()

        nmsed = simple_nms(score, self.nms_radius)
        xy, s, valid = topk_keypoints(nmsed, self.max_keypoints,
                                      self.keypoint_threshold,
                                      nms_tile=self.nms_radius + 1)
        descs = sample_descriptors(desc_map, xy, stride=4)
        return {"keypoints": xy, "scores": s, "valid": valid,
                "descriptors": descs, "dense_scores": score}
