"""Box algebra: conversions, IoU/GIoU/OIoU — batched, jit-friendly.

Semantics match the reference implementations
(/root/reference/src/models/utils.py:16-61 for conversions,
/root/reference/src/losses/utils.py:13-119 for overlaps) but are written
as pure jnp functions over arbitrary leading batch dimensions so they
vmap/pjit cleanly on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def box_tlbr_to_xyxy(loc: Array, tlbr: Array, max_h: float, max_w: float) -> Array:
    """Center location + normalized (top,left,bottom,right) distances -> xyxy.

    Ref semantics: src/models/utils.py:16-28. ``tlbr`` is normalized by the
    image size (t,b by height; l,r by width); output is clamped to the image.

    Args:
      loc:  [..., 2] box center (x, y) in pixels.
      tlbr: [..., 4] normalized distances (t, l, b, r) in [0, 1].
    Returns:
      [..., 4] boxes (x1, y1, x2, y2) clamped to [0, max_w/h].
    """
    t, l, b, r = jnp.split(tlbr, 4, axis=-1)
    x, y = jnp.split(loc, 2, axis=-1)
    t, b = t * max_h, b * max_h
    l, r = l * max_w, r * max_w
    x1 = jnp.clip(x - l, 0.0, max_w)
    y1 = jnp.clip(y - t, 0.0, max_h)
    x2 = jnp.clip(x + r, 0.0, max_w)
    y2 = jnp.clip(y + b, 0.0, max_h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def box_cxywh_to_xyxy(cxywh: Array, max_h: float, max_w: float) -> Array:
    """(cx, cy, w, h) -> clamped (x1, y1, x2, y2). Ref: src/models/utils.py:31-39."""
    cx, cy, w, h = jnp.split(cxywh, 4, axis=-1)
    x1 = jnp.clip(cx - w / 2, 0.0, max_w)
    y1 = jnp.clip(cy - h / 2, 0.0, max_h)
    x2 = jnp.clip(cx + w / 2, 0.0, max_w)
    y2 = jnp.clip(cy + h / 2, 0.0, max_h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def box_xyxy_to_cxywh(xyxy: Array, max_h: float, max_w: float) -> Array:
    """Clamped (x1, y1, x2, y2) -> (cx, cy, w, h). Ref: src/models/utils.py:42-54."""
    x1, y1, x2, y2 = jnp.split(xyxy, 4, axis=-1)
    x1 = jnp.clip(x1, 0.0, max_w)
    x2 = jnp.clip(x2, 0.0, max_w)
    y1 = jnp.clip(y1, 0.0, max_h)
    y2 = jnp.clip(y2, 0.0, max_h)
    cx = (x1 + x2) / 2
    cy = (y1 + y2) / 2
    return jnp.concatenate([cx, cy, x2 - x1, y2 - y1], axis=-1)


def box_xywh_to_xyxy(xywh: Array) -> Array:
    """(x1, y1, w, h) -> (x1, y1, x2, y2). Ref: src/models/utils.py:57-60."""
    x1, y1, w, h = jnp.split(xywh, 4, axis=-1)
    return jnp.concatenate([x1, y1, x1 + w, y1 + h], axis=-1)


def bbox_overlaps_aligned(boxes1: Array, boxes2: Array, mode: str = "iou",
                          eps: float = 1e-6) -> Array:
    """Elementwise IoU (or IoF) between aligned box sets.

    Ref semantics: src/losses/utils.py:69-104 (is_aligned=True branch).

    Args:
      boxes1, boxes2: [..., 4] xyxy.
    Returns:
      [...] IoU values.
    """
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    if mode == "iou":
        area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
        union = area1 + area2 - overlap
    elif mode == "iof":
        union = area1
    else:
        raise ValueError(f"mode must be 'iou' or 'iof', got {mode!r}")
    return overlap / jnp.maximum(union, eps)


def bbox_overlaps_pairwise(boxes1: Array, boxes2: Array, mode: str = "iou",
                           eps: float = 1e-6) -> Array:
    """Pairwise IoU matrix between two box sets.

    Ref semantics: src/losses/utils.py:84-104 (is_aligned=False branch).

    Args:
      boxes1: [..., M, 4]; boxes2: [..., N, 4] xyxy.
    Returns:
      [..., M, N] IoU matrix.
    """
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    if mode == "iou":
        area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
        union = area1[..., :, None] + area2[..., None, :] - overlap
    elif mode == "iof":
        union = jnp.broadcast_to(area1[..., :, None], overlap.shape)
    else:
        raise ValueError(f"mode must be 'iou' or 'iof', got {mode!r}")
    return overlap / jnp.maximum(union, eps)


def bbox_oiou(target: Array, pred: Array, eps: float = 1e-7) -> Array:
    """Asymmetric "overlap IoU": intersection / target area.

    Ref semantics: src/losses/utils.py:107-119. NB: the reference divides by
    the *target* box area without an eps guard; we clamp by ``eps`` to stay
    finite for degenerate GT boxes.
    """
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    return overlap / jnp.maximum(ap, eps)


def iou_loss(pred: Array, target: Array, eps: float = 1e-6) -> Array:
    """-log(IoU) loss. Ref: src/losses/losses.py:87-104."""
    ious = jnp.clip(bbox_overlaps_aligned(pred, target), eps, None)
    return -jnp.log(ious)


def oiou_loss(pred: Array, target: Array, eps: float = 1e-7) -> Array:
    """1 - OIoU loss. Ref: src/losses/losses.py:107-110."""
    return 1.0 - bbox_oiou(target, pred, eps)


def giou_loss(pred: Array, target: Array, eps: float = 1e-7) -> Array:
    """Generalized IoU loss (1 - GIoU). Ref: src/losses/losses.py:113-152."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]

    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = ap + ag - overlap + eps
    ious = overlap / union

    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0.0, None)
    enc_area = enc_wh[..., 0] * enc_wh[..., 1] + eps

    gious = ious - (enc_area - union) / enc_area
    return 1.0 - gious


def pair_overlap_loss(pred1: Array, target1: Array, pred2: Array, target2: Array,
                      oiou: bool = False) -> Array:
    """Symmetric pair loss averaging both images' box losses.

    Ref semantics: IouOverlapLoss, src/losses/losses.py:200-235.
    """
    fn = oiou_loss if oiou else giou_loss
    return (fn(pred1, target1) + fn(pred2, target2)) / 2.0


def compute_locations(h: int, w: int, stride: int = 16) -> Array:
    """Dense (x, y) pixel locations of a feature grid (center convention).

    Ref semantics: src/models/utils.py:135-152.
    Returns [h*w, 2] float32.
    """
    xs = jnp.arange(w, dtype=jnp.float32) * stride + stride // 2
    ys = jnp.arange(h, dtype=jnp.float32) * stride + stride // 2
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)


def mesh_grid_centers(h: int, w: int, stride_h: float, stride_w: float) -> Array:
    """(x+0.5, y+0.5)*stride coordinate map used by OETR's soft-argmax.

    Ref semantics: OETR.generate_mesh_grid, src/model.py:103-107 (kornia
    create_meshgrid with normalized=False, +0.5 offset, scaled by stride).
    Returns [h*w, 2] float32 with (x, y) ordering.
    """
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride_w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride_h
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def delta2bbox(rois: Array, deltas: Array,
               means: tuple = (0.0, 0.0, 0.0, 0.0),
               stds: tuple = (1.0, 1.0, 1.0, 1.0),
               max_shape: tuple | None = None,
               wh_ratio_clip: float = 16.0 / 1000.0) -> Array:
    """Decode (dx, dy, dw, dh) deltas against anchor boxes.

    Ref semantics: src/models/utils.py:63-133 (mmdet-style): denormalize
    by means/stds, clamp log-scale terms at |log(wh_ratio_clip)|, shift
    centers by dx*pw / dy*ph, scale sizes by exp, emit clamped xyxy.
    rois/deltas: [..., 4].
    """
    means_a = jnp.asarray(means, deltas.dtype)
    stds_a = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds_a + means_a
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        h, w = max_shape[:2]
        lim = jnp.asarray([w - 1, h - 1, w - 1, h - 1], out.dtype)
        out = jnp.clip(out, 0.0, lim)
    return out


def mask2bbox(mask: Array) -> Array:
    """Bounding box [x1, y1, x2, y2] of the True pixels of a [..., H, W]
    mask (ref semantics: src/models/utils.py:155-172). All-False masks
    yield a zero box. Static-shaped: masked min/max over the dense grid.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    m = mask.astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    big = jnp.float32(1e9)
    any_true = jnp.max(m, axis=(-2, -1)) > 0
    col = jnp.max(m, axis=-2)     # [..., W] has-any-true per column
    row = jnp.max(m, axis=-1)     # [..., H]
    x1 = jnp.min(jnp.where(col > 0, xs, big), axis=-1)
    x2 = jnp.max(jnp.where(col > 0, xs, -big), axis=-1)
    y1 = jnp.min(jnp.where(row > 0, ys, big), axis=-1)
    y2 = jnp.max(jnp.where(row > 0, ys, -big), axis=-1)
    box = jnp.stack([x1, y1, x2, y2], axis=-1)
    return jnp.where(any_true[..., None], box, jnp.zeros_like(box))


def boxes_from_prob_map(prob: Array, hf: int, wf: int,
                        image_hw: tuple[float, float],
                        q: float = 0.05) -> Array:
    """Overlap box from heatmap mass quantiles (alternative box head).

    The reference derives box sizes from a query-embedding MLP
    (size_regression, src/model.py:188-191); from-scratch training showed
    that head can converge to the full-frame hedge while the *heatmap*
    already concentrates on the overlap. This decodes a box directly from
    the softmaxed center heatmap: per-axis marginal mass, then the
    [q, 1-q] cumulative-mass interval in each axis, mapped to pixels.
    Static-shaped (cumsum + masked argmax) — safe inside jit.

    Args:
      prob: [B, N] softmax heatmap over the hf*wf token grid (row-major).
      hf, wf: token grid dims (static).
      image_hw: (H, W) pixel extent the grid spans.
      q: tail mass excluded on each side per axis.
    Returns:
      [B, 4] xyxy pixel boxes.
    """
    h, w = image_hw
    p = prob.reshape(prob.shape[0], hf, wf)
    px = jnp.sum(p, axis=1)                     # [B, wf] column mass
    py = jnp.sum(p, axis=2)                     # [B, hf] row mass

    def interval(m, n, extent):
        # first cell where cumulative mass reaches q -> left edge of cell;
        # last cell where remaining mass still exceeds q -> right edge.
        c = jnp.cumsum(m, axis=-1)
        total = c[..., -1:]
        lo = jnp.argmax(c >= q * total, axis=-1)
        rem = total - c + m                     # mass from cell i onward
        hi_mask = rem >= q * total
        idx = jnp.arange(n)
        hi = jnp.max(jnp.where(hi_mask, idx, 0), axis=-1)
        stride = extent / n
        a = lo.astype(jnp.float32) * stride
        b = (hi.astype(jnp.float32) + 1.0) * stride
        return a, jnp.maximum(b, a + stride)

    x1, x2 = interval(px, wf, w)
    y1, y2 = interval(py, hf, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
