"""FCOS dense-prediction head + losses — the reference's `oetr_fcos` path.

Parity targets: FCOSHead/DynamicConv/Scale (/root/reference/src/models/
head.py:17-139), sigmoid/softmax focal losses (src/losses/losses.py:20-84,
reg_loss.py:83-124) and FCOSLossComputation with its cross-device
positive-count normalization (src/losses/reg_loss.py:127-254 — the
reference's only explicit collective, a NCCL all_reduce at :24-30, here a
`jax.lax.psum` over the data mesh axis).

Masked/static throughout: positive locations are a dense mask, not a
gathered index set.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.boxes import giou_loss

Array = jnp.ndarray


class Scale(nn.Module):
    """Learnable scalar multiplier (ref: head.py:44-50)."""
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = self.param("scale", lambda k: jnp.asarray(self.init_value,
                                                      jnp.float32))
        return x * s


class DynamicConv(nn.Module):
    """Feature/proposal bilinear mixing block (ref: head.py:17-41)."""
    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Array, pro_features: Array) -> Array:
        x = jnp.einsum("bnc,bcd->bnd", features, pro_features)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden_dim * 2, dtype=self.dtype,
                     name="out_layer")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        return nn.relu(x)


class FCOSHead(nn.Module):
    """Per-pixel cls / bbox / centerness towers (ref: head.py:53-139).

    Input [B, H, W, C] -> (logits [B,H,W,1], bbox [B,H,W,4],
    centerness [B,H,W,1]).
    """
    in_channels: int
    prior_prob: float = 0.01
    stride: int = 16
    norm_reg_targets: bool = False
    centerness_on_reg: bool = True
    is_training: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        def tower(name):
            return nn.Sequential([
                nn.Conv(self.in_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"{name}_conv"),
                nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"{name}_gn"),
                nn.relu,
            ], name=name)

        cls_tower = tower("cls_tower")(x)
        box_tower = tower("bbox_tower")(x)

        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob))
        logits = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                         bias_init=bias_init, name="cls_logits")(cls_tower)
        cent_src = box_tower if self.centerness_on_reg else cls_tower
        centerness = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                             name="centerness")(cent_src)
        bbox = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                       name="bbox_pred")(box_tower)
        bbox = Scale(name="scales")(bbox)
        if self.norm_reg_targets:
            bbox = nn.relu(bbox)
            if not self.is_training:
                bbox = bbox * self.stride
        else:
            bbox = jnp.exp(bbox)
        return logits, bbox, centerness


def sigmoid_focal_loss(logits: Array, targets: Array, gamma: float = 2.0,
                       alpha: float = 0.25) -> Array:
    """Element-wise sigmoid focal loss (ref: reg_loss.py:83-124 /
    losses.py:20-48), sum handled by the caller."""
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def softmax_focal_loss(logits: Array, labels: Array, gamma: float = 2.0) -> Array:
    """Multi-class focal loss -(1-p)^g log(p) (ref: losses.py:51-84)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    return -((1 - pt) ** gamma) * logpt


def compute_centerness_targets(reg_targets: Array) -> Array:
    """sqrt((min_lr/max_lr) * (min_tb/max_tb)) (ref: reg_loss.py:142-148)."""
    lr = reg_targets[..., 0::2]
    tb = reg_targets[..., 1::2]
    c = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-9)) * \
        (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-9))
    return jnp.sqrt(jnp.clip(c, 0.0, None))


def fcos_targets(locations: Array, targets: Array, stride: float = 16.0,
                 center_sampling_radius: float = 2.0,
                 norm_reg_targets: bool = False):
    """Per-location labels + tlbr regression targets
    (ref: reg_loss.py:149-197; one box per image).

    Args:
      locations: [N, 2] pixel centers; targets: [B, 4] xyxy boxes.
    Returns (labels [B, N] bool, reg_targets [B, N, 4]).
    """
    l = locations[None, :, 0] - targets[:, None, 0]
    t = locations[None, :, 1] - targets[:, None, 1]
    r = targets[:, None, 2] - locations[None, :, 0]
    b = targets[:, None, 3] - locations[None, :, 1]
    reg = jnp.stack([l, t, r, b], axis=-1)                  # [B, N, 4]

    radius = stride * center_sampling_radius
    if radius > 0:
        cx = (targets[:, 0] + targets[:, 2]) * 0.5
        cy = (targets[:, 1] + targets[:, 3]) * 0.5
        xmin = jnp.maximum(cx - radius, targets[:, 0])
        ymin = jnp.maximum(cy - radius, targets[:, 1])
        xmax = jnp.minimum(cx + radius, targets[:, 2])
        ymax = jnp.minimum(cy + radius, targets[:, 3])
        cl = locations[None, :, 0] - xmin[:, None]
        ct = locations[None, :, 1] - ymin[:, None]
        cr = xmax[:, None] - locations[None, :, 0]
        cb = ymax[:, None] - locations[None, :, 1]
        inside = jnp.min(jnp.stack([cl, ct, cr, cb], -1), axis=-1) > 0
    else:
        inside = jnp.min(reg, axis=-1) > 0

    if norm_reg_targets:
        reg = reg / stride
    return inside, reg


def fcos_losses(locations: Array, box_cls: Array, box_regression: Array,
                centerness: Array, targets: Array,
                data_axis: str | None = None) -> dict:
    """FCOS loss triple with cross-device normalization.

    Ref: FCOSLossComputation.__call__, reg_loss.py:198-254. The positive
    count and centerness-target sum are averaged across devices exactly
    like the reference's `dist.all_reduce(SUM)/num_gpus` — via
    `jax.lax.psum(..., data_axis) / axis_size` when called inside a
    shard_map/pmap context; locally (data_axis=None) they reduce over the
    local batch only.

    Args:
      locations: [N, 2]; box_cls [B,H,W,1]; box_regression [B,H,W,4];
      centerness [B,H,W,1]; targets [B, 4].
    """
    b = box_cls.shape[0]
    labels, reg_t = fcos_targets(locations, targets)
    cls_flat = box_cls.reshape(-1)
    reg_flat = box_regression.reshape(-1, 4)
    cent_flat = centerness.reshape(-1)
    labels_flat = labels.reshape(-1)
    reg_t_flat = reg_t.reshape(-1, 4)
    pos = labels_flat.astype(jnp.float32)

    num_pos = jnp.sum(pos)
    cent_targets = compute_centerness_targets(reg_t_flat) * pos
    sum_cent = jnp.sum(cent_targets)
    if data_axis is not None:
        n_dev = jax.lax.psum(1, data_axis)
        num_pos_avg = jnp.maximum(jax.lax.psum(num_pos, data_axis) / n_dev, 1.0)
        sum_cent_avg = jax.lax.psum(sum_cent, data_axis) / n_dev
    else:
        num_pos_avg = jnp.maximum(num_pos, 1.0)
        sum_cent_avg = sum_cent

    cls_loss = jnp.sum(sigmoid_focal_loss(cls_flat, pos)) / num_pos_avg

    # Centerness-weighted GIoU regression over positive locations.
    # Convert tlbr distances to pseudo-boxes around the origin for IoU.
    def tlbr_to_box(t):
        return jnp.stack([-t[..., 0], -t[..., 1], t[..., 2], t[..., 3]], -1)

    reg_l = giou_loss(tlbr_to_box(reg_flat), tlbr_to_box(reg_t_flat))
    reg_loss = jnp.sum(reg_l * cent_targets) / jnp.maximum(sum_cent_avg, 1e-9)

    bce = (jnp.clip(cent_flat, 0, None) - cent_flat * cent_targets
           + jnp.log1p(jnp.exp(-jnp.abs(cent_flat))))
    centerness_loss = jnp.sum(bce * pos) / num_pos_avg

    return {"cls_loss": cls_loss, "reg_loss": reg_loss,
            "centerness_loss": centerness_loss, "num_pos": num_pos}
