"""SuperPoint keypoint detector + descriptor in flax.linen (from scratch).

The reference only ships a 45-line wrapper around an empty git submodule
(/root/reference/dloc/core/extractors/superpoint.py:22-45; conf surface:
nms_radius / keypoint_threshold / max_keypoints, dloc/core/
extract_features.py:24-46), so the network is implemented here from its
published architecture (DeTone et al., "SuperPoint: Self-Supervised
Interest Point Detection and Description"):

  VGG-style shared encoder (64,64 | 64,64 | 128,128 | 128,128 with 3
  maxpools -> stride 8), a detector head (65-way softmax per 8x8 cell,
  dustbin dropped, depth-to-space to full resolution) and a descriptor
  head (256-d, bilinear upsample at keypoints + L2 norm).

TPU-first: NHWC, dense score maps, static-k keypoint selection with
validity masks (ops/nms.py) instead of boolean indexing.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import (refine_keypoints, remove_borders,
                       sample_descriptors, simple_nms, topk_keypoints)

Array = jnp.ndarray


class SuperPointNet(nn.Module):
    """Raw network: grayscale image -> (dense scores, coarse descriptors)."""
    descriptor_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array,
                 with_logits: bool = False):
        """image: [B, H, W, 1] in [0, 1]. H, W divisible by 8.

        Returns: scores [B, H, W], desc [B, H/8, W/8, D] (unit norm);
        with_logits=True additionally returns the raw 65-way cell logits
        [B, H/8, W/8, 65] (training target of the MagicPoint-style
        detector loss, training/superpoint.py).
        """
        x = image.astype(self.dtype)
        relu = nn.relu

        def conv(c, name):
            return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name=name)

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        x = relu(conv(64, "conv1a")(x))
        x = relu(conv(64, "conv1b")(x))
        x = pool(x)
        x = relu(conv(64, "conv2a")(x))
        x = relu(conv(64, "conv2b")(x))
        x = pool(x)
        x = relu(conv(128, "conv3a")(x))
        x = relu(conv(128, "conv3b")(x))
        x = pool(x)
        x = relu(conv(128, "conv4a")(x))
        x = relu(conv(128, "conv4b")(x))

        # Detector head: 65 = 8*8 positions + dustbin per cell.
        c = relu(conv(256, "convPa")(x))
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(c)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :-1]
        b, hc, wc, _ = probs.shape
        # Depth-to-space: [B, Hc, Wc, 64] -> [B, Hc*8, Wc*8].
        scores = probs.reshape(b, hc, wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        # Descriptor head.
        d = relu(conv(256, "convDa")(x))
        desc = nn.Conv(self.descriptor_dim, (1, 1), dtype=self.dtype,
                       name="convDb")(d)
        desc = desc.astype(jnp.float32)
        # Smooth normalization, NOT x/max(||x||, eps): near-zero raw
        # descriptors (constant border regions) make the hard-floor
        # gradient explode to inf, which turns global-norm clipping into
        # NaN (observed: one wide-scale homography batch killed training
        # at step 1 on TPU). d/dx of x*rsqrt(||x||^2+eps) is bounded.
        desc = desc * jax.lax.rsqrt(
            jnp.sum(desc * desc, axis=-1, keepdims=True) + 1e-8)
        if with_logits:
            return scores, desc, logits.astype(jnp.float32)
        return scores, desc


class SuperPoint(nn.Module):
    """Full extractor: image -> fixed-k keypoints + descriptors + masks.

    Config mirrors the reference wrapper surface
    (dloc/core/extractors/superpoint.py:23-28).
    """
    nms_radius: int = 4
    keypoint_threshold: float = 0.005
    max_keypoints: int = 1024
    border: int = 4
    descriptor_dim: int = 256
    subpixel: bool = True     # 3x3 centroid refinement (ops/nms.py) —
                              # integer NMS maxima alone cost ~0.5 px of
                              # localization and wreck pose AUC
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array) -> dict:
        """image: [B, H, W, 1] in [0, 1].

        Returns dict: keypoints [B, K, 2] (x, y), scores [B, K],
        valid [B, K], descriptors [B, K, D], dense_scores [B, H, W].
        """
        scores, desc_map = SuperPointNet(self.descriptor_dim, self.dtype,
                                         name="net")(image)
        nmsed = simple_nms(scores, self.nms_radius)
        nmsed = remove_borders(nmsed, self.border)
        xy, kp_scores, valid = topk_keypoints(
            nmsed, self.max_keypoints, self.keypoint_threshold,
            nms_tile=self.nms_radius + 1)
        if self.subpixel:
            xy = refine_keypoints(scores, xy)
        descs = sample_descriptors(desc_map, xy, stride=8)
        return {
            "keypoints": xy,
            "scores": kp_scores,
            "valid": valid,
            "descriptors": descs,
            "dense_scores": scores,
        }


def grayscale(image: Array) -> Array:
    """[..., H, W, 3] RGB in [0,1] -> [..., H, W, 1] luma."""
    w = jnp.array([0.299, 0.587, 0.114], image.dtype)
    return jnp.sum(image * w, axis=-1, keepdims=True)
