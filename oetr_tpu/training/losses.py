"""OETR training losses as pure functions of (model outputs, GT).

Replicates the loss arithmetic embedded in the reference's training
forward (/root/reference/src/model.py:291-376): center/size L1 losses on
normalized cxywh, symmetric GIoU (or OIoU) pair loss, IoU/OIoU metrics,
optional swapped-query cycle-consistency L1 — but masked by the
``overlap_valid`` flag instead of boolean row-filtering (static shapes;
the reference drops invalid rows via fancy indexing, src/model.py:257-269).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.boxes import (bbox_overlaps_aligned, bbox_oiou,
                              box_xyxy_to_cxywh, pair_overlap_loss)

Array = jnp.ndarray


def _masked_mean(x: Array, valid: Array) -> Array:
    """Mean over valid rows; 0 when nothing is valid."""
    w = valid.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(x * w) / denom


def oetr_losses(outputs: dict, gt_bbox1: Array, gt_bbox2: Array,
                valid: Array, image_hw1: tuple[int, int],
                image_hw2: tuple[int, int], oiou: bool = False,
                weights: Array | None = None) -> dict:
    """Full training loss dict.

    Args:
      outputs: OETR forward dict (pred_bbox1/2 xyxy, optional cycle centers).
      gt_bbox1, gt_bbox2: [B, 4] GT overlap boxes (xyxy, pixel frame).
      valid: [B] bool — ``overlap_valid`` flag from the data layer.
      image_hw1, image_hw2: static (H, W) of each image stream.
      weights: optional [B] per-pair loss weights (difficulty_weights).

    Returns dict with entries whose keys contain "loss" summed into the
    total by the train step (reference convention: train.py:118-119).
    """
    h1, w1 = image_hw1
    h2, w2 = image_hw2
    pred1, pred2 = outputs["pred_bbox1"], outputs["pred_bbox2"]
    wts = jnp.ones_like(valid, jnp.float32) if weights is None else weights

    pred_c1 = box_xyxy_to_cxywh(pred1, h1, w1)
    pred_c2 = box_xyxy_to_cxywh(pred2, h2, w2)
    gt_c1 = box_xyxy_to_cxywh(gt_bbox1, h1, w1)
    gt_c2 = box_xyxy_to_cxywh(gt_bbox2, h2, w2)

    scale1 = jnp.array([w1, h1], pred1.dtype)
    scale2 = jnp.array([w2, h2], pred2.dtype)

    def l1(a, b, scale):
        return jnp.mean(jnp.abs(a / scale - b / scale), axis=-1)

    # Localization loss on centers (ref: src/model.py:300-308).
    loc_loss = (_masked_mean(wts * l1(pred_c1[:, :2], gt_c1[:, :2], scale1),
                             valid)
                + _masked_mean(wts * l1(pred_c2[:, :2], gt_c2[:, :2], scale2),
                               valid))
    # Width/height loss, halved (ref: src/model.py:311-319).
    wh_loss = (_masked_mean(wts * l1(pred_c1[:, 2:], gt_c1[:, 2:], scale1),
                            valid)
               + _masked_mean(wts * l1(pred_c2[:, 2:], gt_c2[:, 2:], scale2),
                              valid)) / 2.0
    # Symmetric GIoU/OIoU pair loss (ref: src/model.py:322, losses.py:221-235).
    iou_loss_val = _masked_mean(
        wts * pair_overlap_loss(pred1, gt_bbox1, pred2, gt_bbox2, oiou=oiou),
        valid)

    # Metrics (not part of the summed loss: keys avoid the "loss" substring).
    iou1 = _masked_mean(bbox_overlaps_aligned(pred1, gt_bbox1), valid)
    iou2 = _masked_mean(bbox_overlaps_aligned(pred2, gt_bbox2), valid)
    oiou1 = _masked_mean(bbox_oiou(gt_bbox1, pred1), valid)
    oiou2 = _masked_mean(bbox_oiou(gt_bbox2, pred2), valid)

    out = {
        "iouloss": iou_loss_val,
        "wh_loss": wh_loss,
        "loc_loss": loc_loss,
        "iou1": iou1, "iou2": iou2, "oiou1": oiou1, "oiou2": oiou2,
    }

    if "cycle_center1" in outputs:
        # Cycle-consistency on swapped-query centers (ref: src/model.py:354-374):
        # boxes rebuilt from swapped centers + the original tlbr sizes, then
        # the *center* L1 against GT is penalized.
        def center_l1(center, gt_c, scale):
            return jnp.mean(jnp.abs(center / scale - gt_c[:, :2] / scale),
                            axis=-1)

        cycle = (_masked_mean(center_l1(outputs["cycle_center1"], gt_c1,
                                        scale1), valid)
                 + _masked_mean(center_l1(outputs["cycle_center2"], gt_c2,
                                          scale2), valid))
        out["cycle_loss"] = cycle
    return out


def total_loss(loss_dict: dict) -> Array:
    """Sum of every entry whose key contains "loss" (ref: train.py:118-119)."""
    return sum(v for k, v in loss_dict.items() if "loss" in k)


# ---------------------------------------------------------------------------
# Full depth-warped cycle-consistency loss (CycleOverlapLoss)
# ---------------------------------------------------------------------------


def interpolate_depth(depth: Array, uv: Array):
    """Bilinear depth interpolation with 4-corner validity.

    Dense, static-shaped reformulation of the reference's
    ``CycleOverlapLoss.interpolate_depth`` (src/losses/losses.py:271-360):
    a sample is valid only when all four surrounding depth pixels are > 0
    and the point is in bounds.

    Args:
      depth: [H, W].
      uv: [..., 2] (x, y) sample coordinates.
    Returns:
      (z [...], valid [...] bool).
    """
    h, w = depth.shape
    x, y = uv[..., 0], uv[..., 1]
    in_bounds = (x >= 0) & (y >= 0) & (x <= w - 1) & (y <= h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    xi0, yi0 = x0.astype(jnp.int32), y0.astype(jnp.int32)
    xi1, yi1 = x1.astype(jnp.int32), y1.astype(jnp.int32)
    d00 = depth[yi0, xi0]
    d01 = depth[yi0, xi1]
    d10 = depth[yi1, xi0]
    d11 = depth[yi1, xi1]
    valid = in_bounds & (d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0)
    wx = x - x0
    wy = y - y0
    z = ((1 - wy) * ((1 - wx) * d00 + wx * d01)
         + wy * ((1 - wx) * d10 + wx * d11))
    return z, valid


def warped_box_via_depth(box1: Array, K1: Array, depth1: Array, T1: Array,
                         crop1: Array, ratio1: Array, K2: Array,
                         depth2: Array, T2: Array, crop2: Array,
                         ratio2: Array, occlusion_thresh: float = 1.0):
    """Project the valid-depth pixels inside ``box1`` into image2 and bound
    the surviving cloud — the geometric half of CycleOverlapLoss
    (src/losses/losses.py:250-471: depth_box_filter + warp + bounding).

    Dense/masked instead of gather-based: every pixel of depth1 is warped
    (geometry.overlap.warp_grid_via_depth), then masked by box membership,
    depth validity, bilinear occlusion check |z_est - z2| < 1.0
    (losses.py:446; NB the dataset GT uses 0.5) and in-bounds.

    Returns (box2_warped [4] xyxy float, valid [] bool).
    """
    from ..geometry.overlap import warp_grid_via_depth

    h1, w1 = depth1.shape
    h2, w2 = depth2.shape
    uv2, z2_est, has_depth = warp_grid_via_depth(
        K1, depth1, T1, crop1, ratio1, K2, T2, crop2, ratio2)

    v1 = jnp.arange(h1, dtype=jnp.float32)[:, None]
    u1 = jnp.arange(w1, dtype=jnp.float32)[None, :]
    inside = ((u1 >= box1[0]) & (u1 <= box1[2])
              & (v1 >= box1[1]) & (v1 <= box1[3]))

    z2_interp, interp_valid = interpolate_depth(depth2, uv2)
    not_occluded = jnp.abs(z2_est - z2_interp) < occlusion_thresh
    in_bounds = ((uv2[..., 0] >= 0) & (uv2[..., 0] <= w2 - 1)
                 & (uv2[..., 1] >= 0) & (uv2[..., 1] <= h2 - 1))
    m = inside & has_depth & interp_valid & in_bounds & not_occluded
    any_valid = jnp.any(m)

    big = jnp.float32(1e9)
    x_min = jnp.min(jnp.where(m, uv2[..., 0], big))
    y_min = jnp.min(jnp.where(m, uv2[..., 1], big))
    x_max = jnp.max(jnp.where(m, uv2[..., 0], -big))
    y_max = jnp.max(jnp.where(m, uv2[..., 1], -big))
    box = jnp.stack([x_min, y_min, x_max, y_max])
    box = jnp.where(any_valid, box, jnp.zeros((4,), jnp.float32))
    return box, any_valid


def cycle_overlap_loss(pred_bbox1: Array, pred_bbox2: Array, K1: Array,
                       depth1: Array, T1: Array, crop1: Array, ratio1: Array,
                       K2: Array, depth2: Array, T2: Array, crop2: Array,
                       ratio2: Array, valid: Array,
                       occlusion_thresh: float = 1.0) -> Array:
    """Symmetric depth-warped cycle GIoU loss (CycleOverlapLoss.forward,
    src/losses/losses.py:473-520): warp pred box1's covisible cloud into
    image2, GIoU(pred box2, warped box), and vice versa; averaged.

    All geometry inputs are batched [B, ...]; ``valid`` is the per-pair
    ``overlap_valid`` flag. The warped target box is a constant w.r.t.
    gradients (stop_gradient), matching the reference where the target is
    produced by non-differentiable index filtering.
    """
    import jax

    from ..geometry.boxes import giou_loss

    def one_way(box_a, Ka, da, Ta, ca, ra, box_b, Kb, db, Tb, cb, rb):
        wbox, ok = warped_box_via_depth(
            jax.lax.stop_gradient(box_a), Ka, da, Ta, ca, ra,
            Kb, db, Tb, cb, rb, occlusion_thresh)
        return giou_loss(box_b, jax.lax.stop_gradient(wbox)), ok

    l12, ok12 = jax.vmap(one_way)(pred_bbox1, K1, depth1, T1, crop1, ratio1,
                                  pred_bbox2, K2, depth2, T2, crop2, ratio2)
    l21, ok21 = jax.vmap(one_way)(pred_bbox2, K2, depth2, T2, crop2, ratio2,
                                  pred_bbox1, K1, depth1, T1, crop1, ratio1)
    ok = valid & ok12 & ok21
    return _masked_mean((l12 + l21) / 2.0, ok)


# ---------------------------------------------------------------------------
# Auxiliary coarse-correspondence supervision (token InfoNCE)
# ---------------------------------------------------------------------------


def token_matches_from_geometry(K1: Array, depth1: Array, T1: Array,
                                crop1: Array, ratio1: Array, K2: Array,
                                T2: Array, crop2: Array, ratio2: Array,
                                hw2: tuple[int, int], stride: int,
                                depth2: Array | None = None,
                                occlusion_thresh: float = 0.5):
    """GT coarse-token correspondence for one pair: token i of image1 ->
    token index in image2 (or -1).

    Samples the dense depth warp (geometry.overlap.warp_grid_via_depth)
    at token-center pixels of image1's stride-``stride`` grid, and bins
    the warped coordinate into image2's token grid. A token is matched
    when its center has depth, lands inside image2, and — when
    ``depth2`` is given — is not occluded there: the warped depth must
    agree with image2's depth map within ``occlusion_thresh`` (absolute,
    the same convention the GT overlap box applies,
    geometry/overlap.py:119). Without the check, multi-plane scenes
    supervise tokens toward surfaces hidden behind foreground planes.

    Returns (gt [N] int32, valid [N] bool) with N = (H1/stride)*(W1/stride).
    """
    from ..geometry.overlap import warp_grid_via_depth

    h1, w1 = depth1.shape
    h2, w2 = hw2
    uv2, z2_est, has_depth = warp_grid_via_depth(
        K1, depth1, T1, crop1, ratio1, K2, T2, crop2, ratio2)
    hf1, wf1 = h1 // stride, w1 // stride
    hf2, wf2 = h2 // stride, w2 // stride
    cy = jnp.arange(hf1) * stride + stride // 2
    cx = jnp.arange(wf1) * stride + stride // 2
    centers_uv = uv2[cy[:, None], cx[None, :]]        # [hf1, wf1, 2]
    centers_ok = has_depth[cy[:, None], cx[None, :]]
    tx = jnp.floor(centers_uv[..., 0] / stride).astype(jnp.int32)
    ty = jnp.floor(centers_uv[..., 1] / stride).astype(jnp.int32)
    inside = (tx >= 0) & (tx < wf2) & (ty >= 0) & (ty < hf2)
    ok = centers_ok & inside
    if depth2 is not None:
        ix = jnp.clip((centers_uv[..., 0]).astype(jnp.int32), 0, w2 - 1)
        iy = jnp.clip((centers_uv[..., 1]).astype(jnp.int32), 0, h2 - 1)
        z2 = depth2[iy, ix]
        z_est = z2_est[cy[:, None], cx[None, :]]
        not_occluded = (z2 > 0) & (jnp.abs(z_est - z2) < occlusion_thresh)
        ok = ok & not_occluded
    idx = jnp.where(ok, ty * wf2 + tx, -1)
    return idx.reshape(-1), ok.reshape(-1)


def token_infonce_loss(mem1: Array, mem2: Array, gt1: Array, valid1: Array,
                       temp: float = 0.1) -> Array:
    """InfoNCE over contextualized tokens: matched image1 tokens must
    retrieve their geometric counterpart among image2 tokens.

    This is the LoFTR-style coarse-matching supervision
    (dual-softmax over the token similarity matrix) applied to OETR's
    encoder memory: it provides the direct cross-image (and crucially
    cross-SCALE) feature-matching gradient that box-level losses do not.

    mem1/mem2: [B, N, d]; gt1 [B, N] int (-1 unmatched); valid1 [B, N].
    """
    n1 = mem1 / jnp.maximum(
        jnp.linalg.norm(mem1, axis=-1, keepdims=True), 1e-6)
    n2 = mem2 / jnp.maximum(
        jnp.linalg.norm(mem2, axis=-1, keepdims=True), 1e-6)
    sim = jnp.einsum("bnd,bmd->bnm", n1, n2) / temp
    logp = jax.nn.log_softmax(sim, axis=-1)
    tgt = jnp.maximum(gt1, 0)
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    has = (gt1 >= 0) & valid1
    return -jnp.sum(jnp.where(has, ll, 0.0)) / jnp.maximum(jnp.sum(has), 1.0)


def aux_match_loss(outputs: dict, batch: dict, stride: int,
                   temp: float = 0.1) -> Array:
    """Symmetric token InfoNCE from raw batch geometry (both directions).

    Needs batch keys K1/K2, depth1/depth2, pose1/pose2, crop1/crop2,
    ratio1/ratio2 (the same set the depth-warped cycle loss consumes,
    MegaDepthPairsDataset.batches(geometry=True)).
    """
    import jax as _jax

    h2w2 = batch["image2"].shape[1:3]
    h1w1 = batch["image1"].shape[1:3]
    gt12, ok12 = _jax.vmap(
        lambda K1, d1, T1, c1, r1, K2, T2, c2, r2, d2:
        token_matches_from_geometry(K1, d1, T1, c1, r1, K2, T2, c2, r2,
                                    h2w2, stride, depth2=d2))(
        batch["K1"], batch["depth1"], batch["pose1"], batch["crop1"],
        batch["ratio1"], batch["K2"], batch["pose2"], batch["crop2"],
        batch["ratio2"], batch["depth2"])
    gt21, ok21 = _jax.vmap(
        lambda K2, d2, T2, c2, r2, K1, T1, c1, r1, d1:
        token_matches_from_geometry(K2, d2, T2, c2, r2, K1, T1, c1, r1,
                                    h1w1, stride, depth2=d1))(
        batch["K2"], batch["depth2"], batch["pose2"], batch["crop2"],
        batch["ratio2"], batch["K1"], batch["pose1"], batch["crop1"],
        batch["ratio1"], batch["depth1"])
    v = batch["overlap_valid"][:, None]
    l12 = token_infonce_loss(outputs["mem1"], outputs["mem2"], gt12,
                             ok12 & v, temp)
    l21 = token_infonce_loss(outputs["mem2"], outputs["mem1"], gt21,
                             ok21 & v, temp)
    return (l12 + l21) / 2.0


def heatmap_ce_loss(prob_map: Array, gt_box: Array, valid: Array,
                    image_hw: tuple[int, int],
                    weights: Array | None = None) -> Array:
    """Cross-entropy of the center heatmap vs uniform-in-GT-box tokens.

    The soft-argmax center L1 alone admits a degenerate optimum (uniform
    heatmap -> center pixel -> hedged full box; observed on scale_diff>2
    training even with perfectly discriminative encoder tokens). This
    supervises the heatmap DENSELY: the softmaxed prob map [B, N] must
    put its mass on tokens whose centers fall inside the GT overlap box
    (dense map supervision parallels the reference's FCOS-variant
    centerness/focal supervision, src/models/head.py).

    prob_map: [B, N] softmax over tokens (model output prob_map1/2 for
    an hf x wf grid of image_hw). gt_box: [B, 4] xyxy pixels.
    """
    b, n = prob_map.shape
    h, w = image_hw
    # Token grid side lengths: N = hf * wf with hf/h == wf/w.
    hf = int(round((n * h / w) ** 0.5))
    wf = n // hf
    cy = (jnp.arange(hf, dtype=jnp.float32) + 0.5) * (h / hf)
    cx = (jnp.arange(wf, dtype=jnp.float32) + 0.5) * (w / wf)
    gy, gx = jnp.meshgrid(cy, cx, indexing="ij")
    cxy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)      # [N, 2]
    inside = ((cxy[None, :, 0] >= gt_box[:, None, 0])
              & (cxy[None, :, 0] <= gt_box[:, None, 2])
              & (cxy[None, :, 1] >= gt_box[:, None, 1])
              & (cxy[None, :, 1] <= gt_box[:, None, 3]))       # [B, N]
    tgt = inside.astype(jnp.float32)
    n_inside = jnp.sum(tgt, axis=1, keepdims=True)
    # Tiny GT boxes can contain no token center; fall back to a one-hot
    # target on the token nearest the box center so the hardest
    # small-overlap samples still receive dense supervision (instead of
    # silently degenerating to zero loss).
    box_c = (gt_box[:, None, :2] + gt_box[:, None, 2:]) / 2.0   # [B, 1, 2]
    d2 = jnp.sum((cxy[None] - box_c) ** 2, axis=-1)             # [B, N]
    onehot = jax.nn.one_hot(jnp.argmin(d2, axis=1), n, dtype=jnp.float32)
    tgt = jnp.where(n_inside > 0, tgt / jnp.maximum(n_inside, 1.0), onehot)
    ce = -jnp.sum(tgt * jnp.log(jnp.maximum(prob_map, 1e-9)), axis=1)
    if weights is not None:
        ce = ce * weights
    return _masked_mean(ce, valid)


def size_loss(outputs: dict, gt_bbox1: Array, gt_bbox2: Array, valid: Array,
              image_hw1: tuple[int, int], image_hw2: tuple[int, int],
              weights: Array | None = None) -> Array:
    """Direct FCOS-style supervision of the tlbr size head.

    Round-3 diagnosis: with only box-level losses (center L1 + wh L1 +
    GIoU) the sigmoid tlbr head converges to the full-frame hedge on
    hard scale pairs even when the heatmap localizes (BASELINE.md §3) —
    the box losses give it no per-head gradient target. This supervises
    the head the way the reference's (unwired) FCOS variant supervises
    dense ltrb regression (/root/reference/src/losses/reg_loss.py:198-
    254): the target is the normalized distance from the *predicted*
    center (stop-grad — the center is the anchor the head must
    complete, exactly the quantity used at decode time,
    src/model.py:188-227) to each GT box edge, clipped to [0, 1].

    outputs: OETR forward dict (center1/2 [B,2] px, tlbr1/2 [B,4] in
    (t,l,b,r) normalized order). weights: optional [B] per-pair loss
    weights (difficulty reweighting).
    """
    def one_side(center, tlbr, gt, hw):
        h, w = hw
        c = jax.lax.stop_gradient(center)
        t = (c[:, 1] - gt[:, 1]) / h
        l_ = (c[:, 0] - gt[:, 0]) / w
        b = (gt[:, 3] - c[:, 1]) / h
        r = (gt[:, 2] - c[:, 0]) / w
        tgt = jnp.clip(jnp.stack([t, l_, b, r], axis=-1), 0.0, 1.0)
        return jnp.mean(jnp.abs(tlbr - tgt), axis=-1)

    per = (one_side(outputs["center1"], outputs["tlbr1"], gt_bbox1, image_hw1)
           + one_side(outputs["center2"], outputs["tlbr2"], gt_bbox2,
                      image_hw2)) / 2.0
    if weights is not None:
        per = per * weights
    return _masked_mean(per, valid)


def difficulty_weights(gt_bbox1: Array, gt_bbox2: Array,
                       image_hw1: tuple[int, int],
                       image_hw2: tuple[int, int],
                       power: float = 1.0) -> Array:
    """Per-pair loss weights emphasizing hard scale-difference pairs.

    The scale difference of a pair is estimated from the GT overlap
    boxes themselves (the ratio of covisible-area fractions — the same
    quantity the reference's pair miner thresholds, /root/reference/src/
    utils/megadepth_preprocess.py:71-95): s = sqrt(max(a1, a2) /
    min(a1, a2)), weight = s**power, normalized to mean 1 over the
    batch. Easy same-scale pairs keep weight ~1; a 3x dolly pair gets
    ~3x the gradient — countering the observed optimum where the model
    solves easy pairs and hedges the hard ones.
    """
    def area_frac(box, hw):
        h, w = hw
        a = jnp.clip(box[:, 2] - box[:, 0], 0.0, None) * jnp.clip(
            box[:, 3] - box[:, 1], 0.0, None)
        return jnp.clip(a / (h * w), 1e-4, 1.0)

    a1 = area_frac(gt_bbox1, image_hw1)
    a2 = area_frac(gt_bbox2, image_hw2)
    s = jnp.sqrt(jnp.maximum(a1, a2) / jnp.minimum(a1, a2))
    w = s ** power
    return w / jnp.maximum(jnp.mean(w), 1e-6)
