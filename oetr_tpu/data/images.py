"""Host-side image service: read, aspect-resize, pad to static canvases.

The host prepares fixed-shape device batches (SURVEY.md §2.8 "data
service"): every image becomes (a) a full-res canvas padded to a bucket
shape with its valid (h, w), and (b) a square OETR-pass copy with the
scale back to the full-res frame — replacing the reference's per-pair
dynamic reads (read_overlap_image, /root/reference/dloc/core/utils/
utils.py:271-343).
"""
from __future__ import annotations

from dataclasses import dataclass

import cv2
import numpy as np


@dataclass
class PreparedImage:
    canvas: np.ndarray        # [H, W, 3] float32 in [0, 1], padded
    valid_hw: np.ndarray      # [2] (h, w) of the valid region
    oetr_image: np.ndarray    # [h0, w0, 3] OETR-pass copy
    oetr_scale: np.ndarray    # [2] (sx, sy): full px per oetr px
    orig_hw: tuple[int, int]  # pre-resize source size
    scale_to_orig: np.ndarray  # [2] (sx, sy): original px per canvas px


def read_image(path: str, grayscale: bool = False) -> np.ndarray:
    """cv2 read -> RGB float32 [0, 1] (ref: utils.py:404-436 semantics)."""
    flag = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(path)
    if not grayscale:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:
        img = img[..., None].repeat(3, -1)
    return img.astype(np.float32) / 255.0


def prepare_image(image: np.ndarray, canvas_hw: tuple[int, int],
                  oetr_hw: tuple[int, int] = (640, 640),
                  resize_max: int | None = None) -> PreparedImage:
    """Resize-and-pad an image into the static shapes the pipeline wants.

    Args:
      image: [H, W, 3] float32 in [0, 1].
      canvas_hw: bucket shape for full-res matching.
      oetr_hw: square OETR input (640^2 default,
        scripts/evaluate_megadepth.sh:14).
      resize_max: optional max side before padding (reference
        preprocessing conf 'resize_max', extract_features.py:35).
    """
    h0, w0 = image.shape[:2]
    work = image
    scale_to_orig = np.array([1.0, 1.0])
    if resize_max is not None and max(h0, w0) > resize_max:
        r = resize_max / max(h0, w0)
        work = cv2.resize(image, (round(w0 * r), round(h0 * r)),
                          interpolation=cv2.INTER_AREA)
        scale_to_orig = np.array([w0 / work.shape[1], h0 / work.shape[0]])

    ch, cw = canvas_hw
    h, w = work.shape[:2]
    fit = min(cw / w, ch / h, 1.0)
    if fit < 1.0:
        work = cv2.resize(work, (int(w * fit), int(h * fit)),
                          interpolation=cv2.INTER_AREA)
        scale_to_orig = scale_to_orig / fit
        h, w = work.shape[:2]
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:h, :w] = work

    oh, ow = oetr_hw
    oetr_img = cv2.resize(work, (ow, oh), interpolation=cv2.INTER_AREA)
    oetr_scale = np.array([w / ow, h / oh], np.float32)

    return PreparedImage(
        canvas=canvas,
        valid_hw=np.array([h, w], np.int32),
        oetr_image=oetr_img.astype(np.float32),
        oetr_scale=oetr_scale,
        orig_hw=(h0, w0),
        scale_to_orig=scale_to_orig.astype(np.float32),
    )


def batch_pairs(prepared0: list[PreparedImage], prepared1: list[PreparedImage]):
    """Stack prepared images into pipeline input arrays."""
    stack = lambda xs: np.stack(xs, axis=0)
    return {
        "image0": stack([p.canvas for p in prepared0]),
        "image1": stack([p.canvas for p in prepared1]),
        "full_hw0": stack([p.valid_hw for p in prepared0]),
        "full_hw1": stack([p.valid_hw for p in prepared1]),
        "oetr_img0": stack([p.oetr_image for p in prepared0]),
        "oetr_img1": stack([p.oetr_image for p in prepared1]),
        "scales0": stack([p.oetr_scale for p in prepared0]),
        "scales1": stack([p.oetr_scale for p in prepared1]),
        "scale_to_orig0": stack([p.scale_to_orig for p in prepared0]),
        "scale_to_orig1": stack([p.scale_to_orig for p in prepared1]),
    }
