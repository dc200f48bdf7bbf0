"""SIFT-based host-side extractors: landmark keypoints + ContextDesc.

Host components (cv2) feeding fixed-k device arrays:

  * ``landmark_extract`` — SIFT keypoints only, for template-matching use
    cases (parity: /root/reference/dloc/core/extractors/landmark.py:17-40,
    conf topk 2048 at extract_features.py:113-126).
  * ``ContextDesc`` — the full augmentation network from the paper
    (Luo et al., CVPR 2019): regional visual tower sampled at keypoints
    + geometric context-normalized tower + residual fusion +
    matchability head, trainable from scratch
    (training/contextdesc.py: InfoNCE over homography correspondences +
    matchability BCE). The reference only wraps a closed TF .pb of this
    model (/root/reference/dloc/core/extractors/contextdesc.py:22-70)
    and cannot run without that checkpoint.
  * ``ContextDescAugmenter`` — the lighter MLP variant (descriptor,
    normalized location, score) kept for cheap augmentation.
"""
from __future__ import annotations

from typing import Any

import cv2
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def sift_keypoints(image_u8: np.ndarray, topk: int = 2048,
                   with_descriptors: bool = False):
    """SIFT keypoints (+ optional RootSIFT descriptors), fixed-k padded.

    Args:
      image_u8: [H, W] uint8 grayscale.
    Returns:
      xy [k, 2] float32, scores [k], valid [k] bool
      (+ desc [k, 128] float32 if requested).
    """
    sift = cv2.SIFT_create()
    if with_descriptors:
        kpts, desc = sift.detectAndCompute(image_u8, None)
    else:
        kpts = sift.detect(image_u8, None)
        desc = None
    kpts = list(kpts or [])
    order = np.argsort([-k.response for k in kpts])[:topk]
    xy = np.zeros((topk, 2), np.float32)
    scores = np.zeros(topk, np.float32)
    valid = np.zeros(topk, bool)
    out_desc = np.zeros((topk, 128), np.float32) if with_descriptors else None
    for i, j in enumerate(order):
        xy[i] = kpts[j].pt
        scores[i] = kpts[j].response
        valid[i] = True
        if desc is not None:
            d = desc[j]
            # RootSIFT normalization.
            d = d / max(d.sum(), 1e-12)
            out_desc[i] = np.sqrt(d)
    if with_descriptors:
        return xy, scores, valid, out_desc
    return xy, scores, valid


def landmark_extract(image_u8: np.ndarray, topk: int = 2048) -> dict:
    """SIFT keypoint-only extractor (ref: landmark.py:17-40)."""
    xy, scores, valid = sift_keypoints(image_u8, topk)
    return {"keypoints": xy, "scores": scores, "valid": valid}


class ContextDescAugmenter(nn.Module):
    """Learned descriptor augmentation over SIFT features.

    Maps (rootsift descriptor 128, normalized xy 2, score 1) -> 128-d
    unit descriptor via a residual MLP; trained to add spatial context to
    the raw SIFT descriptor (the role of ContextDesc's matchability /
    context towers).
    """
    out_dim: int = 128
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, desc: Array, xy_norm: Array, scores: Array) -> Array:
        x = jnp.concatenate([desc, xy_norm, scores[..., None]], axis=-1)
        x = x.astype(self.dtype)
        h = nn.Dense(self.hidden, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        out = desc.astype(self.dtype) + h        # residual on RootSIFT
        out = out.astype(jnp.float32)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def _context_norm(x: Array, valid: Array) -> Array:
    """Context normalization (Yi et al. 2018): whiten each feature across
    the *valid* keypoints of an image — the non-local op ContextDesc's
    geometric tower is built from."""
    m = valid[..., None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / cnt
    var = jnp.sum(((x - mean) ** 2) * m, axis=-2, keepdims=True) / cnt
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * m


class ContextDesc(nn.Module):
    """Full ContextDesc augmentation network (Luo et al., CVPR 2019).

    The reference wraps a closed TF .pb of this model
    (/root/reference/dloc/core/extractors/contextdesc.py:22-70). Here the
    architecture is implemented from the paper: the raw RootSIFT
    descriptor is augmented with
      * a **visual context** — a regional conv tower over the image whose
        feature map is bilinearly sampled at each keypoint (the paper's
        ResNet regional features, sized down), and
      * a **geometric context** — a PointNet-style MLP over all keypoint
        locations/scores with context normalization (per-image whitening
        across keypoints) providing the non-local mixing,
    fused residually into a 128-d unit descriptor, plus a per-keypoint
    matchability score head.

    __call__ inputs: image [B, H, W, 1] in [0,1], desc [B, K, 128]
    RootSIFT, xy [B, K, 2] pixels, scores [B, K], valid [B, K] bool.
    """
    out_dim: int = 128
    regional_dim: int = 64
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: Array, desc: Array, xy: Array, scores: Array,
                 valid: Array):
        b, hgt, wid, _ = image.shape
        x = image.astype(self.dtype)
        # Regional tower: 4 stride-2 convs -> [B, H/16, W/16, C].
        for i, ch in enumerate((16, 32, 64, self.regional_dim)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"reg_conv{i}")(x)
            x = nn.relu(x)
        fh, fw = x.shape[1:3]

        # Bilinear sample the regional map at keypoint locations.
        gx = jnp.clip(xy[..., 0] / wid * fw - 0.5, 0, fw - 1)
        gy = jnp.clip(xy[..., 1] / hgt * fh - 0.5, 0, fh - 1)
        x0, y0 = jnp.floor(gx), jnp.floor(gy)
        x1 = jnp.minimum(x0 + 1, fw - 1)
        y1 = jnp.minimum(y0 + 1, fh - 1)
        wx, wy = gx - x0, gy - y0

        def gather(feat, yy, xx):
            idx = (yy * fw + xx).astype(jnp.int32)           # [B, K]
            flat = feat.reshape(b, fh * fw, -1)
            return jnp.take_along_axis(flat, idx[..., None], axis=1)

        vis = ((1 - wx)[..., None] * (1 - wy)[..., None] * gather(x, y0, x0)
               + wx[..., None] * (1 - wy)[..., None] * gather(x, y0, x1)
               + (1 - wx)[..., None] * wy[..., None] * gather(x, y1, x0)
               + wx[..., None] * wy[..., None] * gather(x, y1, x1))
        vis = nn.Dense(self.hidden, dtype=self.dtype, name="vis_proj")(vis)

        # Geometric tower: context-normalized MLP over (xy_norm, score).
        xy_norm = xy / jnp.asarray([wid, hgt], jnp.float32) - 0.5
        g = jnp.concatenate([xy_norm.astype(self.dtype),
                             scores[..., None].astype(self.dtype)], -1)
        for i in range(3):
            g = nn.Dense(self.hidden, dtype=self.dtype,
                         name=f"geo_fc{i}")(g)
            g = _context_norm(g, valid)
            g = nn.relu(g)

        # Fusion: residual on the raw descriptor.
        fused = jnp.concatenate([desc.astype(self.dtype), vis, g], axis=-1)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fuse_fc1")(fused)
        h = nn.relu(h)
        delta = nn.Dense(self.out_dim, dtype=self.dtype, name="fuse_fc2")(h)
        out = (desc.astype(self.dtype) + delta).astype(jnp.float32)
        out = out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        out = out * valid[..., None]

        match_logit = nn.Dense(1, dtype=self.dtype, name="matchability")(h)
        matchability = nn.sigmoid(match_logit.astype(jnp.float32))[..., 0]
        return out, matchability * valid


def contextdesc_extract(image_u8: np.ndarray, augmenter=None, params=None,
                        topk: int = 2048) -> dict:
    """SIFT + learned context augmentation (ref: contextdesc.py:22-70).

    ``augmenter`` may be the full ContextDesc network (image-conditioned)
    or the lighter ContextDescAugmenter MLP; both take converted/trained
    params (the reference's TF checkpoint is closed, so weights are a
    training/conversion concern — the architecture is complete).
    """
    h, w = image_u8.shape[:2]
    xy, scores, valid, desc = sift_keypoints(image_u8, topk,
                                             with_descriptors=True)
    if isinstance(augmenter, ContextDesc) and params is not None:
        img = jnp.asarray(image_u8, jnp.float32)[None, :, :, None] / 255.0
        desc_j, match = augmenter.apply(
            params, img, jnp.asarray(desc)[None], jnp.asarray(xy)[None],
            jnp.asarray(scores)[None], jnp.asarray(valid)[None])
        desc = np.asarray(desc_j)[0]
        scores = np.asarray(match)[0]
    elif augmenter is not None and params is not None:
        xy_norm = xy / np.array([w, h], np.float32) - 0.5
        desc = np.asarray(augmenter.apply(
            params, jnp.asarray(desc)[None], jnp.asarray(xy_norm)[None],
            jnp.asarray(scores)[None]))[0]
    return {"keypoints": xy, "scores": scores, "valid": valid,
            "descriptors": desc}
