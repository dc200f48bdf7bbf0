"""Batched on-device crop/resize warps + keypoint frame transforms.

TPU-native replacement for the reference's host-side cv2 crop/resize
chain (`tensor_overlap_crop`/`patch_resize`, /root/reference/dloc/core/
utils/utils.py:476-564, which round-trips GPU->CPU->GPU per pair): a
single bilinear gather warp from a predicted box onto a fixed canvas,
batched over pairs, with uniform-ratio bookkeeping so keypoints can be
mapped back exactly (`(kpts/ratio) + box_origin`, reference semantics at
dloc/core/overlap_features.py:123-127).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .nms import bilinear_sample

Array = jnp.ndarray


def _axis_weights(n_out: int, n_in: int, ratio: Array, origin: Array) -> Array:
    """Dense [n_out, n_in] bilinear interpolation matrix for one axis.

    Row i holds the two taps of the clamped bilinear sample at source
    coordinate (i + 0.5)/ratio + origin - 0.5 — exactly the per-pixel
    arithmetic of ops.nms.bilinear_sample, factorized per axis.
    """
    s = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) / ratio + origin - 0.5
    s = jnp.clip(s, 0.0, n_in - 1.0)
    i0 = jnp.floor(s).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_in - 1)
    w1 = (s - i0)[:, None]
    return (jax.nn.one_hot(i0, n_in, dtype=jnp.float32) * (1.0 - w1)
            + jax.nn.one_hot(i1, n_in, dtype=jnp.float32) * w1)


def crop_resize(image: Array, box: Array, out_hw: tuple[int, int]):
    """Crop ``box`` (xyxy) from ``image`` and resize onto a fixed canvas,
    preserving aspect (uniform ratio, like the reference's patch_resize
    uniform branch, utils.py:476-489).

    The sampling grid is an outer product (x depends only on the output
    column, y only on the output row), so the bilinear warp factorizes
    exactly into two small dense matmuls (out = Wy @ image @ Wx^T per
    channel) that run on the MXU — the gather formulation
    (crop_resize_gather) measured ~60 ms/pair at 832^2 on v5e and
    dominated the whole matching pipeline (PERF.md round 4); the matmul
    form is memory-bound at ~100x less wall time.

    Args:
      image: [H, W, C] float.
      box: [4] (x1, y1, x2, y2) in image pixels.
      out_hw: static canvas (H_out, W_out).

    Returns:
      canvas [H_out, W_out, C]; ratio [] (canvas px per image px);
      valid [H_out, W_out] bool (canvas area covered by the crop).
    """
    h_out, w_out = out_hw
    h_in, w_in = image.shape[:2]
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    ratio = jnp.minimum(w_out / bw, h_out / bh)

    Wy = _axis_weights(h_out, h_in, ratio, y1).astype(image.dtype)
    Wx = _axis_weights(w_out, w_in, ratio, x1).astype(image.dtype)
    tmp = jnp.einsum("oy,yxc->oxc", Wy, image)
    canvas = jnp.einsum("px,oxc->opc", Wx, tmp)

    xs = (jnp.arange(w_out, dtype=jnp.float32) + 0.5) / ratio + x1 - 0.5
    ys = (jnp.arange(h_out, dtype=jnp.float32) + 0.5) / ratio + y1 - 0.5
    valid = (xs[None, :] <= x2 - 0.5) & (ys[:, None] <= y2 - 0.5)
    canvas = canvas * valid[..., None].astype(image.dtype)
    return canvas, ratio, valid


def crop_resize_gather(image: Array, box: Array, out_hw: tuple[int, int]):
    """Gather-based reference implementation of crop_resize (same
    semantics; kept as the parity oracle for the matmul fast path)."""
    h_out, w_out = out_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    ratio = jnp.minimum(w_out / bw, h_out / bh)

    xs = (jnp.arange(w_out, dtype=jnp.float32) + 0.5) / ratio + x1 - 0.5
    ys = (jnp.arange(h_out, dtype=jnp.float32) + 0.5) / ratio + y1 - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    canvas = bilinear_sample(image, coords).reshape(h_out, w_out, -1)
    valid = (gx <= x2 - 0.5) & (gy <= y2 - 0.5)
    canvas = canvas * valid[..., None]
    return canvas, ratio, valid


crop_resize_batch = jax.vmap(crop_resize, in_axes=(0, 0, None))


def unwarp_keypoints(kpts: Array, box: Array, ratio: Array) -> Array:
    """Canvas keypoints -> original-image frame.

    Ref: kpts_full = kpts / ratio + box[:2]
    (dloc/core/overlap_features.py:123-127).

    Args:
      kpts: [..., N, 2] canvas (x, y); box: [..., 4]; ratio: [...].
    """
    return kpts / ratio[..., None, None] + box[..., None, :2]


def resize_to_canvas(image: Array, out_hw: tuple[int, int]):
    """Aspect-preserving resize of a full image onto a canvas (the host
    normally does this once per image; this on-device version serves the
    640^2 OETR pass, reference read path: read_overlap_image,
    dloc/core/utils/utils.py:271-343).

    Returns canvas [H_out, W_out, C], scale (image px per canvas px).
    """
    h, w = image.shape[:2]
    box = jnp.array([0.0, 0.0, float(w), float(h)], jnp.float32)
    canvas, ratio, valid = crop_resize(image, box, out_hw)
    return canvas, 1.0 / ratio, valid
