"""DISK keypoint detector + descriptor in flax.linen (from scratch).

The reference ships only a 61-line wrapper around an empty submodule
(/root/reference/dloc/core/extractors/disk.py:18-61; conf: nms window 5,
topk 2048, 128-d descriptors — extract_features.py:95-112). Implemented
from the published architecture (Tyszkiewicz et al., "DISK: Learning
local features with policy gradient"): a U-Net over the RGB image
producing a 128-d descriptor map + 1-channel detection heatmap at full
resolution; inference keypoints = NMS + fixed-k top-k.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nms import sample_descriptors, simple_nms, topk_keypoints

Array = jnp.ndarray


class _ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features),
                         dtype=self.dtype)(x)
        return nn.relu(x)


class DiskUNet(nn.Module):
    """4-level U-Net: down (32, 64, 64, 64), up with skip concats."""
    down_dims: tuple[int, ...] = (32, 64, 64, 64)
    out_channels: int = 129            # 128 desc + 1 heatmap
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        skips = []
        for i, c in enumerate(self.down_dims):
            x = _ConvBlock(c, self.dtype, name=f"down_{i}a")(x)
            x = _ConvBlock(c, self.dtype, name=f"down_{i}b")(x)
            if i < len(self.down_dims) - 1:
                skips.append(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        for i, skip in enumerate(reversed(skips)):
            b, h, w, c = skip.shape
            x = jax.image.resize(x, (b, h, w, x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            lvl = len(self.down_dims) - 2 - i
            x = _ConvBlock(self.down_dims[lvl], self.dtype,
                           name=f"up_{i}")(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="head")(x)


class DISK(nn.Module):
    """Full extractor (conf parity: extract_features.py:95-112)."""
    descriptor_dim: int = 128
    window: int = 5                    # NMS window (disk.py:23)
    max_keypoints: int = 2048          # 'topk'
    keypoint_threshold: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array) -> dict:
        """image: [B, H, W, 3] RGB in [0, 1]; H, W divisible by 8."""
        out = DiskUNet(out_channels=self.descriptor_dim + 1,
                       dtype=self.dtype, name="unet")(image.astype(self.dtype))
        desc_map = out[..., :self.descriptor_dim].astype(jnp.float32)
        heat = out[..., -1].astype(jnp.float32)
        nmsed = simple_nms(heat, self.window // 2)
        xy, scores, valid = topk_keypoints(nmsed, self.max_keypoints,
                                           self.keypoint_threshold,
                                           nms_tile=self.window // 2 + 1)
        descs = sample_descriptors(desc_map, xy, stride=1)
        return {"keypoints": xy, "scores": scores, "valid": valid,
                "descriptors": descs, "dense_scores": heat}
