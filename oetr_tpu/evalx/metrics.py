"""Aggregate benchmark metrics (host-side numpy).

Parity targets: pose_auc / pose_acc / pose_mAA from the reference
(/root/reference/dloc/evaluate/utils/utils.py:347-376) and the recall
computation of training-time validation (/root/reference/src/utils/
validation.py:20-50). These run once per benchmark over a few thousand
scalars — numpy on the host is the right tool, not the TPU.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def pose_auc(errors: Sequence[float], thresholds: Sequence[float]) -> list[float]:
    """Trapezoid AUC of recall vs angular-error curve at each threshold.

    Ref: dloc/evaluate/utils/utils.py:347-359.
    """
    errors = np.asarray(list(errors), dtype=np.float64)
    sort_idx = np.argsort(errors)
    errors = errors[sort_idx]
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        aucs.append(float(np.trapezoid(r, x=e) / t))
    return aucs


def pose_acc(errors: Sequence[float], thresholds: Sequence[float]) -> list[float]:
    """Fraction of errors below each threshold. Ref: utils.py:362-368."""
    errors = np.asarray(list(errors), dtype=np.float64)
    return [float((errors < t).sum() / len(errors)) for t in thresholds]


def pose_mAA(errors: Sequence[float]) -> float:
    """IMC mean average accuracy over the 1..10 degree histogram.

    Ref: dloc/evaluate/utils/utils.py:370-376.
    """
    errors = np.asarray(list(errors), dtype=np.float64)
    bars = np.arange(11)
    qt_hist, _ = np.histogram(errors, bars)
    qt_hist = qt_hist.astype(float) / float(len(errors))
    return float(np.mean(np.cumsum(qt_hist)))


def iou_recalls(ious: Sequence[float],
                thresholds: Sequence[float] | None = None) -> np.ndarray:
    """Recall of IoU values at each threshold (overlap-box validation).

    Ref: _recalls/eval_recalls, src/utils/validation.py:20-50. Default
    thresholds 0.5:0.05:0.95; the headline numbers are R0.5/R0.75/R0.9
    (indices 0/5/8).
    """
    if thresholds is None:
        thresholds = np.arange(0.5, 0.96, 0.05)
    ious = np.asarray(list(ious), dtype=np.float64)
    thresholds = np.asarray(thresholds, dtype=np.float64)
    return np.array([(ious >= t).sum() / float(len(ious)) for t in thresholds])


def error_summary(errors_R: Sequence[float], errors_t: Sequence[float],
                  thresholds: Sequence[float] = (5.0, 10.0, 20.0)) -> dict:
    """Headline MegaDepth table: AUC of max(err_R, err_t).

    Ref aggregation: eval_megadepth.py:48-52.
    """
    err = np.maximum(np.asarray(list(errors_R), dtype=np.float64),
                     np.asarray(list(errors_t), dtype=np.float64))
    aucs = pose_auc(err, list(thresholds))
    return {f"auc@{int(t)}": a for t, a in zip(thresholds, aucs)}
