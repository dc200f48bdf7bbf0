"""IMC-protocol metric math — parity with dloc/evaluate/utils/utils.py.

Quaternion-based R/t angular errors (:146-172), essential-matrix
evaluation (:175-194, with our recover_pose instead of cv2), depth-based
keypoint projection (:197-212), repeatability (:214-238), and the
symmetric epipolar distance used by the IMC matching score (:265-343).
Host-side numpy — these run per pair on scalar-sized data.
"""
from __future__ import annotations

import numpy as np

from ..sfm.colmap_model import rotmat2qvec


def evaluate_R_t(R_gt, t_gt, R, t):
    """Quaternion/vector angular errors in radians (ref: utils.py:146-172)."""
    eps = 1e-15
    t = np.asarray(t).flatten()
    t_gt = np.asarray(t_gt).flatten()
    q = rotmat2qvec(np.asarray(R))
    q_gt = rotmat2qvec(np.asarray(R_gt))
    q = q / (np.linalg.norm(q) + eps)
    q_gt = q_gt / (np.linalg.norm(q_gt) + eps)
    loss_q = np.maximum(eps, 1.0 - np.sum(q * q_gt) ** 2)
    err_q = np.arccos(1 - 2 * loss_q)

    t = t / (np.linalg.norm(t) + eps)
    t_gt = t_gt / (np.linalg.norm(t_gt) + eps)
    loss_t = np.maximum(eps, 1.0 - np.sum(t * t_gt) ** 2)
    err_t = np.arccos(np.sqrt(1 - loss_t))
    return float(err_q), float(err_t)


def eval_essential_matrix(p1n, p2n, E, dR, dt):
    """(err_q, err_t) radians from an E matrix + normalized correspondences
    (ref: utils.py:175-194); failure -> (pi, pi/2)."""
    import jax
    import jax.numpy as jnp

    from ..geometry.ransac import recover_pose

    if len(p1n) != len(p2n):
        raise RuntimeError("Size mismatch in the keypoint lists")
    if p1n.shape[0] < 5 or E is None or np.size(E) == 0:
        return np.pi, np.pi / 2
    res = recover_pose(jnp.asarray(E, jnp.float64), jnp.asarray(p1n),
                       jnp.asarray(p2n), jnp.ones(len(p1n), bool))
    return evaluate_R_t(dR, dt, np.asarray(res["R"]), np.asarray(res["t"]))


def get_projected_kp(x1, x2, d1, d2, dR, dT):
    """Depth-project normalized keypoints into the other view
    (ref: utils.py:197-212)."""
    y1 = np.concatenate([x1 * d1, d1], axis=1)
    y2 = np.concatenate([x2 * d2, d2], axis=1)
    dT = np.asarray(dT).reshape(3, 1)
    y1p = np.matmul(dR[None], y1[..., None]) + dT[None]
    y2p = (np.matmul(np.transpose(dR)[None], y2[..., None])
           - np.matmul(np.transpose(dR), dT)[None])
    x1p = np.squeeze(y1p[:, 0:2] / y1p[:, [2]], axis=-1)
    x2p = np.squeeze(y2p[:, 0:2] / y2p[:, [2]], axis=-1)
    return x1p, x2p


def get_repeatability(kp1n_p, kp2n, th_list):
    """Fraction of projected keypoints with a neighbor within each
    threshold (ref: utils.py:214-238)."""
    if np.ndim(th_list) == 0:
        th_list = [th_list]
    if kp1n_p.shape[0] == 0 or kp2n.shape[0] == 0:
        return [0] * len(th_list)
    from scipy.spatial import distance
    dis = distance.cdist(kp1n_p, kp2n, metric="sqeuclidean")
    min_d = np.amin(dis, 1)
    return [float((min_d < th * th).sum() / kp1n_p.shape[0])
            for th in th_list]


def get_episym(x1n, x2n, dR, dt):
    """Symmetric epipolar distance for normalized coords under (R, t)
    (ref: utils.py:244-300)."""
    if x1n.ndim == 1:
        x1n = x1n[None]
        x2n = x2n[None]
    n = len(x1n)
    x1h = np.concatenate([x1n, np.ones((n, 1))], axis=1)
    x2h = np.concatenate([x2n, np.ones((n, 1))], axis=1)
    dt = np.asarray(dt).flatten()
    t_skew = np.array([[0, -dt[2], dt[1]], [dt[2], 0, -dt[0]],
                       [-dt[1], dt[0], 0]])
    E = t_skew @ dR
    Ex1 = x1h @ E.T
    Etx2 = x2h @ E
    x2tEx1 = np.sum(x2h * Ex1, axis=1)
    return x2tEx1 ** 2 * (
        1.0 / np.maximum(Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2, 1e-15)
        + 1.0 / np.maximum(Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2, 1e-15))


def eval_match_score(x1n, x2n, x1p, x2p, dR, dt, epi_thresh: float = 1e-4,
                     dist_thresh: float = 4e-3):
    """IMC matching score: epipolar-consistent AND reprojection-consistent
    matches (ref semantics: utils.py:303-343 — geod_d from get_episym,
    true_d from projected-keypoint distance).

    Returns (geod_d [N], true_d [N], correct_mask [N]).
    """
    geod = get_episym(x1n, x2n, dR, dt)
    d1 = np.linalg.norm(x1p - x2n, axis=1)
    d2 = np.linalg.norm(x2p - x1n, axis=1)
    true_d = (d1 + d2) / 2
    correct = (geod < epi_thresh) & (true_d < dist_thresh)
    return geod, true_d, correct
