"""OETR training losses as pure functions of (model outputs, GT).

Replicates the loss arithmetic embedded in the reference's training
forward (/root/reference/src/model.py:291-376): center/size L1 losses on
normalized cxywh, symmetric GIoU (or OIoU) pair loss, IoU/OIoU metrics,
optional swapped-query cycle-consistency L1 — but masked by the
``overlap_valid`` flag instead of boolean row-filtering (static shapes;
the reference drops invalid rows via fancy indexing, src/model.py:257-269).
"""
from __future__ import annotations

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
                image_hw2: tuple[int, int], oiou: bool = False) -> dict:
    """Full training loss dict.

    Args:
      outputs: OETR forward dict (pred_bbox1/2 xyxy, optional cycle centers).
      gt_bbox1, gt_bbox2: [B, 4] GT overlap boxes (xyxy, pixel frame).
      valid: [B] bool — ``overlap_valid`` flag from the data layer.
      image_hw1, image_hw2: static (H, W) of each image stream.

    Returns dict with entries whose keys contain "loss" summed into the
    total by the train step (reference convention: train.py:118-119).
    """
    h1, w1 = image_hw1
    h2, w2 = image_hw2
    pred1, pred2 = outputs["pred_bbox1"], outputs["pred_bbox2"]

    pred_c1 = box_xyxy_to_cxywh(pred1, h1, w1)
    pred_c2 = box_xyxy_to_cxywh(pred2, h2, w2)
    gt_c1 = box_xyxy_to_cxywh(gt_bbox1, h1, w1)
    gt_c2 = box_xyxy_to_cxywh(gt_bbox2, h2, w2)

    scale1 = jnp.array([w1, h1], pred1.dtype)
    scale2 = jnp.array([w2, h2], pred2.dtype)

    def l1(a, b, scale):
        return jnp.mean(jnp.abs(a / scale - b / scale), axis=-1)

    # Localization loss on centers (ref: src/model.py:300-308).
    loc_loss = (_masked_mean(l1(pred_c1[:, :2], gt_c1[:, :2], scale1), valid)
                + _masked_mean(l1(pred_c2[:, :2], gt_c2[:, :2], scale2), valid))
    # Width/height loss, halved (ref: src/model.py:311-319).
    wh_loss = (_masked_mean(l1(pred_c1[:, 2:], gt_c1[:, 2:], scale1), valid)
               + _masked_mean(l1(pred_c2[:, 2:], gt_c2[:, 2:], scale2), valid)
               ) / 2.0
    # Symmetric GIoU/OIoU pair loss (ref: src/model.py:322, losses.py:221-235).
    iou_loss_val = _masked_mean(
        pair_overlap_loss(pred1, gt_bbox1, pred2, gt_bbox2, oiou=oiou), valid)

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
