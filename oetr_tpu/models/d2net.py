"""D2-Net detect-and-describe network in flax.linen (from scratch).

Reference surface: a wrapper that auto-downloads caffe-trained weights
(/root/reference/dloc/core/extractors/d2net.py:17-72; conf: multiscale,
caffe BGR normalization). Implemented from the published architecture
(Dusmanu et al., "D2-Net: A Trainable CNN for Joint Description and
Detection"): VGG16 truncated at conv4_3 (stride 8, 512 channels); the
*same* feature map is the dense descriptor field and the detector —
score = soft local-max (spatial) x ratio-to-channel-max, keypoints are
local maxima of the score map upsampled to input resolution.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import sample_descriptors, simple_nms, topk_keypoints

Array = jnp.ndarray

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)


class VGGConv4(nn.Module):
    """VGG16 through conv4_3 (stride 8)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{i}")(x)
                x = nn.relu(x)
                i += 1
        return x


def d2net_scores(features: Array) -> Array:
    """Joint detection score map (D2-Net eq. 4-6).

    alpha: softmax-like soft local-max over each 3x3 neighborhood;
    beta: channel ratio-to-max; score = max_c(alpha*beta), normalized.
    features: [B, Hc, Wc, C] -> [B, Hc, Wc].
    """
    f = nn.relu(features)
    # Soft local-max: exp(f) / sum over 3x3 window of exp(f).
    e = jnp.exp(f - jax.lax.stop_gradient(
        jnp.max(f, axis=(1, 2, 3), keepdims=True)))
    window_sum = jax.lax.reduce_window(
        e, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    alpha = e / jnp.maximum(window_sum, 1e-12)
    beta = f / jnp.maximum(jnp.max(f, axis=-1, keepdims=True), 1e-12)
    score = jnp.max(alpha * beta, axis=-1)
    norm = jnp.sum(score, axis=(1, 2), keepdims=True)
    return score / jnp.maximum(norm, 1e-12)


class D2Net(nn.Module):
    """Full extractor (conf parity: extract_features.py:48-59)."""
    max_keypoints: int = 2048
    nms_radius: int = 2
    keypoint_threshold: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array) -> dict:
        """image: [B, H, W, 3] in [0, 1] (H, W divisible by 8)."""
        feats = VGGConv4(self.dtype, name="vgg")(image.astype(self.dtype))
        desc_map = feats.astype(jnp.float32)
        desc_map = desc_map / jnp.maximum(
            jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-12)
        score_c = d2net_scores(feats.astype(jnp.float32))    # [B, Hc, Wc]

        b, hc, wc = score_c.shape
        score = jax.image.resize(score_c, (b, hc * 8, wc * 8), "bilinear")
        nmsed = simple_nms(score, self.nms_radius)
        xy, s, valid = topk_keypoints(nmsed, self.max_keypoints,
                                      self.keypoint_threshold,
                                      nms_tile=self.nms_radius + 1)
        descs = sample_descriptors(desc_map, xy, stride=8)
        return {"keypoints": xy, "scores": s, "valid": valid,
                "descriptors": descs, "dense_scores": score}
