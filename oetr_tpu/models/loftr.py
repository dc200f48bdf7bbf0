"""LoFTR detector-free matcher in flax.linen (from scratch).

The reference ships only a wrapper around an empty submodule
(/root/reference/dloc/core/matchers/loftr.py:24-61: outdoor_ds checkpoint,
dense mkpts returned as pairwise keypoints). The network is implemented
here from its published architecture (Sun et al., "LoFTR: Detector-Free
Local Feature Matching with Transformers"):

  ResNet-FPN (1/8 coarse 256-d + 1/2 fine 128-d) -> sine PE ->
  4x(self, cross) *linear*-attention coarse transformer -> dual-softmax
  coarse matching (temperature 0.1, mutual-nearest + threshold) ->
  static top-K match selection -> 5x5 fine windows from the 1/2 features
  -> 1x(self, cross) fine transformer -> correlation soft-argmax subpixel
  refinement.

TPU-first: all selection is fixed-K with validity masks; window gathers
are take_along_axis over precomputed index grids (no dynamic shapes).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import full_attention, linear_attention
from .oetr import sine_position_encoding

Array = jnp.ndarray


def _gn_groups(features: int) -> int:
    """Largest of (32, 16, 8, 4, 1) dividing ``features``."""
    for g in (32, 16, 8, 4):
        if features % g == 0:
            return g
    return 1


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = _gn_groups(self.features)
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=g, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=g, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            residual = nn.GroupNorm(num_groups=g, dtype=self.dtype)(residual)
        return nn.relu(residual + y)


class ResNetFPN_8_2(nn.Module):
    """LoFTR's backbone: coarse 1/8 (d_coarse) + fine 1/2 (d_fine) maps."""
    initial_dim: int = 128
    # NB: the published LoFTR uses (128, 196, 256); 196 is not divisible by
    # the 32 GroupNorm groups we use instead of BatchNorm, so the middle
    # stage is 192 here (equivalent capacity, TPU-friendly norm).
    block_dims: tuple[int, int, int] = (128, 192, 256)
    d_fine: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        """x: [B, H, W, 1] grayscale. Returns (coarse [B,H/8,W/8,C3],
        fine [B,H/2,W/2,d_fine])."""
        x = x.astype(self.dtype)
        x = nn.Conv(self.initial_dim, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=_gn_groups(self.initial_dim),
                         dtype=self.dtype)(x)
        x0 = nn.relu(x)                                   # 1/2
        x1 = _BasicBlock(self.block_dims[0], 1, self.dtype)(x0)   # 1/2
        x1 = _BasicBlock(self.block_dims[0], 1, self.dtype)(x1)
        x2 = _BasicBlock(self.block_dims[1], 2, self.dtype)(x1)   # 1/4
        x2 = _BasicBlock(self.block_dims[1], 1, self.dtype)(x2)
        x3 = _BasicBlock(self.block_dims[2], 2, self.dtype)(x2)   # 1/8
        x3 = _BasicBlock(self.block_dims[2], 1, self.dtype)(x3)

        # FPN top-down to 1/2 for the fine features.
        c3 = nn.Conv(self.block_dims[2], (1, 1), dtype=self.dtype,
                     name="out3")(x3)
        up2 = jax.image.resize(c3, (c3.shape[0], x2.shape[1], x2.shape[2],
                                    c3.shape[3]), "bilinear")
        l2 = nn.Conv(self.block_dims[2], (1, 1), dtype=self.dtype,
                     name="lat2")(x2)
        m2 = nn.Conv(self.block_dims[1], (3, 3), padding=1, dtype=self.dtype,
                     name="smooth2")(nn.relu(up2 + l2))
        up1 = jax.image.resize(m2, (m2.shape[0], x1.shape[1], x1.shape[2],
                                    m2.shape[3]), "bilinear")
        l1 = nn.Conv(self.block_dims[1], (1, 1), dtype=self.dtype,
                     name="lat1")(x1)
        fine = nn.Conv(self.d_fine, (3, 3), padding=1, dtype=self.dtype,
                       name="smooth1")(nn.relu(up1 + l1))
        return c3, fine


class LoFTREncoderLayer(nn.Module):
    """LoFTR's transformer layer: attention message + concat-MLP residual."""
    d_model: int
    nhead: int = 8
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        b, n, _ = x.shape
        hd = self.d_model // self.nhead
        attend = linear_attention if self.attention == "linear" else full_attention
        q = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="q_proj")(x).reshape(b, n, self.nhead, hd)
        k = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="k_proj")(source).reshape(b, -1, self.nhead, hd)
        v = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="v_proj")(source).reshape(b, -1, self.nhead, hd)
        msg = attend(q, k, v, x_mask, source_mask).reshape(b, n, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       name="merge")(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm1")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.d_model, use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype)(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(y)
        return x + y


class LoFTRModule(nn.Module):
    """num_layers x (self, cross) over two token streams."""
    d_model: int
    num_layers: int
    nhead: int = 8
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f0, f1, m0=None, m1=None):
        for i in range(self.num_layers):
            s = LoFTREncoderLayer(self.d_model, self.nhead, self.attention,
                                  self.dtype, name=f"self_{i}")
            c = LoFTREncoderLayer(self.d_model, self.nhead, self.attention,
                                  self.dtype, name=f"cross_{i}")
            f0 = s(f0, f0, m0, m0)
            f1 = s(f1, f1, m1, m1)
            f0n = c(f0, f1, m0, m1)
            f1n = c(f1, f0, m1, m0)
            f0, f1 = f0n, f1n
        return f0, f1


def _gather_windows(feat: Array, centers_xy: Array, window: int) -> Array:
    """Gather [K, W*W, C] windows from [H, W, C] around integer centers.

    centers_xy: [K, 2] (x, y) in feat's grid; out-of-range clamps.
    """
    h, w, c = feat.shape
    r = window // 2
    offs = jnp.arange(-r, r + 1)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ys = jnp.clip(centers_xy[:, 1:2].astype(jnp.int32) + oy.reshape(1, -1),
                  0, h - 1)                                  # [K, W*W]
    xs = jnp.clip(centers_xy[:, 0:1].astype(jnp.int32) + ox.reshape(1, -1),
                  0, w - 1)
    return feat[ys, xs]                                      # [K, W*W, C]


class LoFTR(nn.Module):
    """End-to-end dense matcher.

    Returns fixed-K matched keypoint pairs with confidences + validity.
    """
    d_coarse: int = 256
    d_fine: int = 128
    coarse_layers: int = 4
    fine_layers: int = 1
    nhead: int = 8
    temperature: float = 0.1
    match_threshold: float = 0.2
    max_matches: int = 1024
    fine_window: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image0: Array, image1: Array,
                 mask0: Array | None = None, mask1: Array | None = None) -> dict:
        """image0/1: [B, H, W, 1] grayscale in [0,1], H, W divisible by 8.
        mask0/1: optional [B, H/8, W/8] coarse validity masks.

        Returns dict: mkpts0/mkpts1 [B, K, 2] full-res (x, y), conf [B, K],
        valid [B, K].
        """
        b, H, W, _ = image0.shape
        backbone = ResNetFPN_8_2(
            initial_dim=self.d_coarse // 2,
            block_dims=(self.d_coarse // 2, 3 * self.d_coarse // 4,
                        self.d_coarse),
            d_fine=self.d_fine, dtype=self.dtype, name="backbone")
        c0, f0 = backbone(image0)
        c1, f1 = backbone(image1)
        hc, wc = c0.shape[1:3]
        n = hc * wc

        pe = sine_position_encoding(self.d_coarse, (hc, wc), legacy=True)
        c0 = (c0 + pe[None]).reshape(b, n, self.d_coarse)
        c1 = (c1 + pe[None]).reshape(b, n, self.d_coarse)
        m0 = mask0.reshape(b, n) if mask0 is not None else None
        m1 = mask1.reshape(b, n) if mask1 is not None else None

        coarse = LoFTRModule(self.d_coarse, self.coarse_layers, self.nhead,
                             "linear", self.dtype, name="coarse")
        c0, c1 = coarse(c0, c1, m0, m1)

        # Dual-softmax coarse matching (LoFTR eq. 3-4).
        feat0 = c0.astype(jnp.float32)
        feat1 = c1.astype(jnp.float32)
        feat0 = feat0 / jnp.maximum(
            jnp.linalg.norm(feat0, axis=-1, keepdims=True), 1e-12)
        feat1 = feat1 / jnp.maximum(
            jnp.linalg.norm(feat1, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bmd,bnd->bmn", feat0, feat1) / self.temperature
        if m0 is not None:
            sim = jnp.where(m0[:, :, None] & m1[:, None, :], sim, -1e9)
        conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)

        # Mutual nearest + threshold.
        max_r = jnp.max(conf, axis=2, keepdims=True)
        max_c = jnp.max(conf, axis=1, keepdims=True)
        mutual = (conf == max_r) & (conf == max_c)
        cand = jnp.where(mutual & (conf > self.match_threshold), conf, 0.0)

        # Static top-K over row maxima.
        row_best = jnp.max(cand, axis=2)                 # [B, N]
        row_arg = jnp.argmax(cand, axis=2)               # [B, N]
        k = min(self.max_matches, n)
        topv, topi = jax.lax.top_k(row_best, k)          # [B, K]
        j_idx = jnp.take_along_axis(row_arg, topi, axis=1)
        valid = topv > 0.0

        # Coarse pixel coordinates (grid centers * 8).
        def grid_xy(idx):
            return jnp.stack([(idx % wc).astype(jnp.float32),
                              (idx // wc).astype(jnp.float32)], axis=-1)

        mk0_coarse = grid_xy(topi) * 8.0 + 4.0           # [B, K, 2] full-res
        mk1_coarse = grid_xy(j_idx) * 8.0 + 4.0

        # ---- Fine refinement ----
        ww = self.fine_window ** 2
        fine_proj = nn.Dense(self.d_fine, dtype=self.dtype, name="fine_proj")
        f0p = fine_proj(f0)
        f1p = fine_proj(f1)

        # Window centers in the 1/2-resolution fine grid.
        cen0 = (mk0_coarse / 2.0)
        cen1 = (mk1_coarse / 2.0)
        w0 = jax.vmap(lambda fm, c: _gather_windows(fm, c, self.fine_window)
                      )(f0p, cen0)                       # [B, K, ww, C]
        w1 = jax.vmap(lambda fm, c: _gather_windows(fm, c, self.fine_window)
                      )(f1p, cen1)

        fine = LoFTRModule(self.d_fine, self.fine_layers, self.nhead,
                           "linear", self.dtype, name="fine")
        w0f, w1f = fine(w0.reshape(b * k, ww, self.d_fine),
                        w1.reshape(b * k, ww, self.d_fine))
        w0f = w0f.reshape(b, k, ww, self.d_fine).astype(jnp.float32)
        w1f = w1f.reshape(b, k, ww, self.d_fine).astype(jnp.float32)

        # Correlate center vector of window0 with all of window1.
        center = w0f[:, :, ww // 2]                      # [B, K, C]
        heat = jnp.einsum("bkc,bkwc->bkw", center, w1f) / (self.d_fine ** 0.5)
        prob = jax.nn.softmax(heat, axis=-1)             # [B, K, ww]
        r = self.fine_window // 2
        offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
        grid = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # [ww, 2]
        delta_fine = jnp.einsum("bkw,wd->bkd", prob, grid)           # grid units
        mk1 = mk1_coarse + delta_fine * 2.0              # fine stride = 2 px

        return {
            "mkpts0": mk0_coarse,
            "mkpts1": mk1,
            "conf": topv,
            "valid": valid,
            "coarse_conf": conf,
            # Selected coarse cells + the pre-refinement position of the
            # image-1 match — the handles fine-stage supervision needs
            # (training/loftr.loftr_fine_loss).
            "cells0": topi,
            "cells1": j_idx,
            "mkpts1_coarse": mk1_coarse,
        }
