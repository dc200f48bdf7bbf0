"""Per-pair two-view evaluation — validation_error parity.

Reimplements /root/reference/dloc/evaluate/utils/evaluation.py:285-357:
precision (symmetric epipolar error < 5e-4), matching score, angular pose
errors via RANSAC essential + recoverPose — with our batched XLA
estimator (geometry/ransac.py) instead of OpenCV, including the OETR
crop-intrinsics correction (evaluation.py:305-323).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar import symmetric_epipolar_error
from ..geometry.ransac import estimate_pose
from ..geometry.epipolar import pose_error as pose_error_fn

EPI_THRESH = 5e-4      # reference precision threshold (evaluation.py:327)


def correct_intrinsics(K: np.ndarray, inparams: np.ndarray) -> np.ndarray:
    """Adjust K for the crop/resize chain recorded in ``inparams``
    (sx, sy, tx, ty, rx, ry) — ref: evaluation.py:305-321."""
    sx, sy, tx, ty, rx, ry = inparams
    K_nto = np.array([[sx / rx, 0, sx * tx], [0, sy / ry, sy * ty],
                      [0, 0, 1.0]])
    K_inv = np.linalg.inv(K) @ K_nto
    return np.linalg.inv(K_inv)


def _pad_pow2(a: np.ndarray, min_n: int = 64):
    n = len(a)
    pad = max(min_n, int(2 ** np.ceil(np.log2(max(n, 1)))))
    out = np.zeros((pad,) + a.shape[1:], a.dtype)
    out[:n] = a
    valid = np.zeros(pad, bool)
    valid[:n] = True
    return out, valid


def validation_error(kpts0: np.ndarray, kpts1: np.ndarray,
                     matches: np.ndarray, K0: np.ndarray, K1: np.ndarray,
                     T_0to1: np.ndarray,
                     inparams0: np.ndarray | None = None,
                     inparams1: np.ndarray | None = None,
                     thresh_px: float = 1.0, rng_seed: int = 0) -> dict:
    """One pair's metrics.

    Args:
      kpts0/kpts1: [N0/N1, 2]; matches: [2, M] index pairs.
    Returns dict: error_t, error_R, precision, matching_score,
    num_correct, epipolar_errors, inliers.
    """
    if inparams0 is not None:
        K0 = correct_intrinsics(K0, np.asarray(inparams0).reshape(-1))
    if inparams1 is not None:
        K1 = correct_intrinsics(K1, np.asarray(inparams1).reshape(-1))

    mk0 = kpts0[matches[0]][:, :2].astype(np.float64)
    mk1 = kpts1[matches[1]][:, :2].astype(np.float64)

    if len(mk0) == 0:
        return {"error_t": np.inf, "error_R": np.inf, "precision": 0.0,
                "matching_score": 0.0, "num_correct": 0,
                "epipolar_errors": np.array([]), "inliers": np.array([])}

    epi = np.asarray(symmetric_epipolar_error(
        jnp.asarray(mk0), jnp.asarray(mk1), jnp.asarray(T_0to1),
        jnp.asarray(K0), jnp.asarray(K1)))
    correct = epi < EPI_THRESH
    num_correct = int(correct.sum())
    precision = float(correct.mean()) if len(correct) else 0.0
    matching_score = num_correct / len(kpts0) if len(kpts0) else 0.0

    if len(mk0) < 5:
        err_t = err_R = np.inf
        inliers = np.zeros(len(mk0), bool)
    else:
        p0, valid = _pad_pow2(mk0.astype(np.float32))
        p1, _ = _pad_pow2(mk1.astype(np.float32))
        res = estimate_pose(jnp.asarray(p0), jnp.asarray(p1),
                            jnp.asarray(valid), jnp.asarray(K0),
                            jnp.asarray(K1), jax.random.key(rng_seed),
                            thresh_px=thresh_px)
        if bool(res["ok"]):
            et, eR = pose_error_fn(jnp.asarray(T_0to1), res["R"], res["t"])
            err_t, err_R = float(et), float(eR)
            inliers = np.asarray(res["inliers"])[:len(mk0)]
        else:
            err_t = err_R = np.inf
            inliers = np.zeros(len(mk0), bool)

    return {
        "error_t": err_t, "error_R": err_R, "precision": precision,
        "matching_score": matching_score, "num_correct": num_correct,
        "epipolar_errors": epi, "inliers": inliers,
    }
