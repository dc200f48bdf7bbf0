"""SIFT-based host-side extractors: landmark keypoints + ContextDesc.

Host components (cv2) feeding fixed-k device arrays:

  * ``landmark_extract`` — SIFT keypoints only, for template-matching use
    cases (parity: /root/reference/dloc/core/extractors/landmark.py:17-40,
    conf topk 2048 at extract_features.py:113-126).
  * ``ContextDescAugmenter`` — SIFT keypoints + descriptors with a
    learned augmentation MLP over (descriptor, normalized location,
    score) in flax, standing in for the reference's TF .pb ContextDesc
    model (/root/reference/dloc/core/extractors/contextdesc.py:22-70;
    the original's regional/visual-context towers are unavailable — the
    reference itself cannot run without its closed TF checkpoint).
"""
from __future__ import annotations

from typing import Any

import cv2
import flax.linen as nn
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


def contextdesc_extract(image_u8: np.ndarray, augmenter=None, params=None,
                        topk: int = 2048) -> dict:
    """SIFT + optional learned augmentation (ref: contextdesc.py:22-70)."""
    h, w = image_u8.shape[:2]
    xy, scores, valid, desc = sift_keypoints(image_u8, topk,
                                             with_descriptors=True)
    if augmenter is not None and params is not None:
        xy_norm = xy / np.array([w, h], np.float32) - 0.5
        desc = np.asarray(augmenter.apply(
            params, jnp.asarray(desc)[None], jnp.asarray(xy_norm)[None],
            jnp.asarray(scores)[None]))[0]
    return {"keypoints": xy, "scores": scores, "valid": valid,
            "descriptors": desc}
