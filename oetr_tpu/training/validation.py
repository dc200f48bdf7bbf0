"""Training-time validation: IoU recall of predicted overlap boxes.

Parity with /root/reference/src/utils/validation.py:53-146 (evaluate /
evaluate_dummy): per-pair IoU (and optional OIoU) of predicted vs GT
boxes over the val set, recall at thresholds 0.5:0.05:0.95, headline
R0.5/R0.75/R0.9.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..evalx.metrics import iou_recalls
from ..geometry.boxes import bbox_overlaps_aligned, bbox_oiou


def evaluate(model, params, batches, oiou: bool = False) -> dict:
    """Run predictions over an iterable of batches; return recall summary.

    Each batch: dict with image1/image2 [B,H,W,3], overlap_box1/2 [B,4],
    overlap_valid [B].
    """
    apply = jax.jit(lambda p, a, b: model.apply(p, a, b, deterministic=True))
    ious, oious = [], []
    for batch in batches:
        out = apply(params, jnp.asarray(batch["image1"]),
                    jnp.asarray(batch["image2"]))
        v = np.asarray(batch["overlap_valid"])
        for side in ("1", "2"):
            pred = np.asarray(out[f"pred_bbox{side}"])[v]
            gt = np.asarray(batch[f"overlap_box{side}"])[v]
            if len(pred) == 0:
                continue
            ious += list(np.asarray(bbox_overlaps_aligned(
                jnp.asarray(pred), jnp.asarray(gt))))
            if oiou:
                oious += list(np.asarray(bbox_oiou(
                    jnp.asarray(gt), jnp.asarray(pred))))

    recalls = iou_recalls(ious) if ious else np.zeros(10)
    out = {
        "recalls": recalls,
        "R0.5": float(recalls[0]),
        "R0.75": float(recalls[5]),
        "R0.9": float(recalls[8]),
        "mean_iou": float(np.mean(ious)) if ious else 0.0,
        "num_samples": len(ious),
    }
    if oiou and oious:
        orec = iou_recalls(oious)
        out["oiou_recalls"] = orec
        out["mean_oiou"] = float(np.mean(oious))
    return out
