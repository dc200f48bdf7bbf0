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


def _symmetric_epipolar_np(mk0: np.ndarray, mk1: np.ndarray,
                           T_0to1: np.ndarray, K0: np.ndarray,
                           K1: np.ndarray) -> np.ndarray:
    """Float64 replica of the reference's compute_epipolar_error
    (evaluation.py:247-262) — including its idiosyncratic normalizer
    ``1/(Ep0_x + Ep0_y) + 1/(Etp1_x + Etp1_y)`` (no squares), which the
    precision metric thresholds at 5e-4."""
    p0 = np.concatenate([(mk0 - K0[[0, 1], [2, 2]]) / K0[[0, 1], [0, 1]],
                         np.ones((len(mk0), 1))], axis=1)
    p1 = np.concatenate([(mk1 - K1[[0, 1], [2, 2]]) / K1[[0, 1], [0, 1]],
                         np.ones((len(mk1), 1))], axis=1)
    t0, t1, t2 = T_0to1[:3, 3]
    t_skew = np.array([[0, -t2, t1], [t2, 0, -t0], [-t1, t0, 0.0]])
    E = t_skew @ T_0to1[:3, :3]
    Ep0 = p0 @ E.T
    p1Ep0 = np.sum(p1 * Ep0, axis=-1)
    Etp1 = p1 @ E
    return p1Ep0 ** 2 * (1.0 / (Ep0[:, 0] + Ep0[:, 1])
                         + 1.0 / (Etp1[:, 0] + Etp1[:, 1]))


def validation_error(kpts0: np.ndarray, kpts1: np.ndarray,
                     matches: np.ndarray, K0: np.ndarray, K1: np.ndarray,
                     T_0to1: np.ndarray,
                     inparams0: np.ndarray | None = None,
                     inparams1: np.ndarray | None = None,
                     thresh_px: float = 1.0, rng_seed: int = 0,
                     num_hypotheses: int = 512,
                     lo_candidates: int = 8) -> dict:
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

    # float64 numpy on the host: the jnp-float32 path loses precision
    # right at the 5e-4 threshold and was measurably off the reference's
    # own arithmetic in the round-4 IMC crosscheck (the batched jnp
    # implementation, geometry/epipolar.py, remains the on-device path).
    epi = _symmetric_epipolar_np(mk0, mk1, np.asarray(T_0to1, np.float64),
                                 np.asarray(K0, np.float64),
                                 np.asarray(K1, np.float64))
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
        # Pin the estimator to the CPU backend: the 5-point hypothesis
        # round (geometry/fivepoint.py) solves its eigenproblem on the
        # host via pure_callback, which the tunneled axon TPU runtime
        # does not support — and per-pair RANSAC is host-scale work
        # anyway (keeps the chip free for the batched matching path).
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            res = estimate_pose(jnp.asarray(p0), jnp.asarray(p1),
                                jnp.asarray(valid), jnp.asarray(K0),
                                jnp.asarray(K1), jax.random.key(rng_seed),
                                thresh_px=thresh_px,
                                num_hypotheses=num_hypotheses,
                                lo_candidates=lo_candidates,
                                use_5pt=True)
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
