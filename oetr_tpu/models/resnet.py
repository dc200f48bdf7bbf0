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

from typing import Any

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


class FusedGNPool(nn.Module):
    """GroupNorm + ReLU + 3x3/s2 max-pool as one Pallas kernel.

    Drop-in for the stem's ``GroupNorm -> relu -> max_pool`` chain with
    flax.linen.GroupNorm's exact param names/shapes (scale, bias).
    """
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ..ops.pallas_norm import groupnorm_relu_maxpool_trainable

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        h = x.shape[1]
        # Largest output-row tile <= 5 dividing the pooled height: the
        # tunneled Mosaic toolchain fails to compile toh >= 8 at stem
        # width (PERF.md, round 4), and toh=5 is what the measurement
        # actually ran with.
        toh = next(t for t in range(min(5, h // 2 - 1), 0, -1)
                   if (h // 2) % t == 0)
        return groupnorm_relu_maxpool_trainable(
            x, scale, bias, self.num_groups, self.epsilon, toh)


class ResNetEncoder(nn.Module):
    """Truncated ResNet feature extractor.

    Input: [B, H, W, 3] in [0, 1]. Output: [B, H/s, W/s, C] with s=16 for
    stop_layer='layer3' (C=1024 for depth 50) or s=32 for 'layer4'.
    """
    depth: int = 50
    stop_layer: str = "layer3"
    norm: str = "gn"
    norm_input: bool = True
    stem_s2d: bool = False
    fused_stem: bool = False    # Pallas GN+ReLU+pool stem (ops/pallas_norm)
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

        if self.stem_s2d:
            # Space-to-depth stem (TPU MLPerf ResNet trick): a 3-channel
            # 7x7/s2 conv runs the MXU at 3/128 input-channel utilization;
            # folding 2x2 pixel blocks into channels ([B,H,W,3] ->
            # [B,H/2,W/2,12]) and using the exactly-equivalent 4x4/s1
            # conv (7x7 kernel zero-padded to 8x8, pixel-phase
            # interleaved — see space_to_depth_kernel) quadruples MXU
            # occupancy on the most bandwidth-bound layer.
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                      4 * c)
            x = nn.Conv(64, (4, 4), strides=(1, 1),
                        padding=((2, 1), (2, 1)), use_bias=False,
                        dtype=self.dtype)(x)
        else:
            # Stem: conv7x7/s2 (+ norm + relu + maxpool3x3/s2 below).
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, dtype=self.dtype)(x)
        if self.fused_stem and self.norm == "gn":
            # Pallas fused GN+ReLU+maxpool (ops/pallas_norm.py): one
            # read -> quarter-size write instead of three full-res
            # passes over the largest activation in the model. Named
            # "GroupNorm_0" so the param tree (scale/bias) is identical
            # to the unfused path — checkpoints interchange freely.
            x = FusedGNPool(dtype=self.dtype, name="GroupNorm_0")(x)
        else:
            x = make_norm()(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        n_stages = {"layer1": 1, "layer2": 2, "layer3": 3, "layer4": 4}[
            self.stop_layer]
        for stage in range(n_stages):
            for b in range(stages[stage]):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Block(widths[stage], stride=stride, norm=self.norm,
                          dtype=self.dtype)(x)
        return x


def space_to_depth_kernel(k7: Array) -> Array:
    """Map a [7, 7, C, O] stride-2 stem kernel to the exactly-equivalent
    [4, 4, 4C, O] kernel for the space-to-depth stem.

    Zero-pad to 8x8 at the top-left (K8[u, v] = K7[u-1, v-1]), then
    interleave pixel phases: K'[p, q, (dy, dx, c)] = K8[2p+dy, 2q+dx, c],
    matching the (dy, dx, c) channel order of the s2d reshape.
    """
    c, o = k7.shape[2], k7.shape[3]
    k8 = jnp.zeros((8, 8, c, o), k7.dtype).at[1:, 1:].set(k7)
    # [8, 8, C, O] -> [4, dy, 4, dx, C, O] -> [4, 4, dy, dx, C, O]
    k = k8.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * c, o)


def backbone_channels(depth: int, stop_layer: str) -> int:
    """Output channel count (ref LAST_LAYER, src/config/default.py:15)."""
    mult = 4 if depth > 34 else 1
    base = {"layer1": 64, "layer2": 128, "layer3": 256, "layer4": 512}[stop_layer]
    return base * mult
