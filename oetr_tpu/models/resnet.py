"""ResNet encoder in flax.linen — NHWC, GroupNorm, truncatable.

TPU-native re-design of the reference's torchvision-based encoder
(/root/reference/src/models/backbone.py:130-174): same topology
(conv7x7/s2 stem -> maxpool -> layer1..layerN, truncated at layer3 for
stride 16 or layer4 for stride 32) but NHWC layout (XLA's preferred conv
layout on TPU) and GroupNorm instead of BatchNorm — per-device batches
are small under data parallelism and GN needs no cross-chip stat sync.
The reference relies on ImageNet-pretrained weights (backbone.py:145);
this build trains from scratch (SURVEY.md §7 "pretrained-weight gap").
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

# depth -> (block type, blocks per stage)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x - mean) / sqrt(var + eps) * scale + bias.

    Exists for loading reference checkpoints (the torchvision backbone is
    BatchNorm, /root/reference/src/models/backbone.py:145); all four
    tensors are plain params set by interop.torch_convert from the torch
    module's weight/bias/running_mean/running_var. Not meant for training
    (no stat updates) — train with GroupNorm instead.
    """
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = (scale / jnp.sqrt(var + self.epsilon)).astype(self.dtype)
        shift = (bias - mean * scale / jnp.sqrt(var + self.epsilon)).astype(
            self.dtype)
        return x.astype(self.dtype) * inv + shift


def _norm(name: str, dtype: Any):
    # epsilon 1e-5 matches torch.nn.{GroupNorm,LayerNorm,BatchNorm2d}
    # defaults so converted reference checkpoints are numerically exact.
    if name == "gn":
        return lambda: nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype)
    if name == "ln":
        return lambda: nn.LayerNorm(epsilon=1e-5, dtype=dtype)
    if name == "bn":
        return lambda: FrozenBatchNorm(dtype=dtype)
    raise ValueError(f"unknown norm {name!r}")


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        make_norm = _norm(self.norm, self.dtype)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = make_norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = make_norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = make_norm()(residual)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    features: int              # bottleneck width; output is 4x
    stride: int = 1
    norm: str = "gn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        make_norm = _norm(self.norm, self.dtype)
        out_ch = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = make_norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = make_norm()(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = make_norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(out_ch, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = make_norm()(residual)
        return nn.relu(residual + y)


class ResNetEncoder(nn.Module):
    """Truncated ResNet feature extractor.

    Input: [B, H, W, 3] in [0, 1]. Output: [B, H/s, W/s, C] with s=16 for
    stop_layer='layer3' (C=1024 for depth 50) or s=32 for 'layer4'.
    """
    depth: int = 50
    stop_layer: str = "layer3"
    norm: str = "gn"
    norm_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        block_kind, stages = RESNET_SPECS[self.depth]
        Block = BasicBlock if block_kind == "basic" else Bottleneck
        make_norm = _norm(self.norm, self.dtype)

        if self.norm_input:
            # Fixed colorspace normalization (ref: backbone.py:162-163).
            x = (x - 0.45) / 0.225
        x = x.astype(self.dtype)

        # Stem: conv7x7/s2 + norm + relu + maxpool3x3/s2.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = make_norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        n_stages = {"layer1": 1, "layer2": 2, "layer3": 3, "layer4": 4}[
            self.stop_layer]
        for stage in range(n_stages):
            for b in range(stages[stage]):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Block(widths[stage], stride=stride, norm=self.norm,
                          dtype=self.dtype)(x)
        return x


def backbone_channels(depth: int, stop_layer: str) -> int:
    """Output channel count (ref LAST_LAYER, src/config/default.py:15)."""
    mult = 4 if depth > 34 else 1
    base = {"layer1": 64, "layer2": 128, "layer3": 256, "layer4": 512}[stop_layer]
    return base * mult
