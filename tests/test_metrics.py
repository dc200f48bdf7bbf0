"""Benchmark aggregate metrics vs reference transcriptions
(dloc/evaluate/utils/utils.py:347-376, src/utils/validation.py:20-50)."""
import numpy as np

from oetr_tpu.evalx import (error_summary, iou_recalls, pose_acc, pose_auc,
                            pose_mAA)


def _ref_pose_auc(errors, thresholds):
    sort_idx = np.argsort(errors)
    errors = np.array(errors.copy())[sort_idx]
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        aucs.append(np.trapezoid(r, x=e) / t)
    return aucs


def test_pose_auc_matches_reference(rng):
    errors = rng.uniform(0, 30, 500)
    ours = pose_auc(errors, [5, 10, 20])
    ref = _ref_pose_auc(errors, [5, 10, 20])
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_pose_auc_perfect_and_worst():
    np.testing.assert_allclose(pose_auc(np.zeros(100), [5.0]), [1.0], atol=1e-9)
    aucs = pose_auc(np.full(100, 1000.0), [5.0])
    assert aucs[0] < 0.02


def test_pose_mAA(rng):
    errors = rng.uniform(0, 20, 1000)
    ref_hist, _ = np.histogram(errors, np.arange(11))
    ref = np.mean(np.cumsum(ref_hist / 1000.0))
    np.testing.assert_allclose(pose_mAA(errors), ref, rtol=1e-12)


def test_pose_acc():
    errors = [1.0, 3.0, 7.0, 100.0]
    np.testing.assert_allclose(pose_acc(errors, [5.0, 10.0]), [0.5, 0.75])


def test_iou_recalls():
    ious = [0.6, 0.8, 0.95, 0.3]
    r = iou_recalls(ious)
    assert len(r) == 10
    np.testing.assert_allclose(r[0], 0.75)   # R0.5
    np.testing.assert_allclose(r[5], 0.5)    # R0.75
    np.testing.assert_allclose(r[8], 0.25)   # R0.9


def test_error_summary():
    out = error_summary([1.0, 6.0], [2.0, 3.0], thresholds=(5.0, 10.0))
    assert set(out) == {"auc@5", "auc@10"}
    ref = _ref_pose_auc(np.array([2.0, 6.0]), [5.0, 10.0])
    np.testing.assert_allclose([out["auc@5"], out["auc@10"]], ref, rtol=1e-12)
