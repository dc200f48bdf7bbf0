"""Batched DLT homography + similarity estimation with fixed-budget RANSAC.

Replaces the reference's cv2 calls — cv2.findHomography in get_pose
(/root/reference/dloc/api.py:181-224), cv2.estimateAffinePartial2D in the
ICP matcher and PR evaluation (dloc/core/matchers/icp.py:97,
dloc/evaluate/utils/evaluation.py:50-66) — with XLA programs: fixed
hypothesis budgets, masked scoring, static shapes (same design as
geometry/ransac.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def homography_dlt(pts0: Array, pts1: Array, weights: Array | None = None) -> Array:
    """Weighted DLT homography from >= 4 correspondences.

    Builds the standard 2N x 9 system with Hartley normalization on both
    point sets. Returns H [3, 3] (maps pts0 -> pts1), scaled so H[2,2]~1.
    """
    n = pts0.shape[0]
    w = jnp.ones((n,), pts0.dtype) if weights is None else weights
    wsum = jnp.maximum(jnp.sum(w), 1e-9)

    def normalize(p):
        mean = jnp.sum(p * w[:, None], axis=0) / wsum
        d = jnp.sqrt(jnp.sum((p - mean) ** 2, axis=-1))
        scale = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sum(d * w) / wsum, 1e-9)
        T = jnp.array([[scale, 0.0, -scale * mean[0]],
                       [0.0, scale, -scale * mean[1]],
                       [0.0, 0.0, 1.0]], p.dtype)
        return (p - mean) * scale, T

    p0, T0 = normalize(pts0)
    p1, T1 = normalize(pts1)

    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_a = jnp.stack([-x, -y, -ones, zeros, zeros, zeros,
                        u * x, u * y, u], axis=-1)
    rows_b = jnp.stack([zeros, zeros, zeros, -x, -y, -ones,
                        v * x, v * y, v], axis=-1)
    A = jnp.concatenate([rows_a * w[:, None], rows_b * w[:, None]], axis=0)
    _, V = jnp.linalg.eigh(A.T @ A)
    h = V[:, 0]
    Hn = h.reshape(3, 3)
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1e-12)


def similarity_from_2pts(p0: Array, p1: Array) -> Array:
    """2D similarity (scale + rotation + translation) from 2 point pairs —
    the minimal model of cv2.estimateAffinePartial2D. Returns [3, 3]."""
    d0 = p0[1] - p0[0]
    d1 = p1[1] - p1[0]
    denom = jnp.maximum(d0[0] ** 2 + d0[1] ** 2, 1e-12)
    # complex division (a+bi)/(c+di)
    a = (d1[0] * d0[0] + d1[1] * d0[1]) / denom
    b = (d1[1] * d0[0] - d1[0] * d0[1]) / denom
    t = p1[0] - jnp.array([a * p0[0, 0] - b * p0[0, 1],
                           b * p0[0, 0] + a * p0[0, 1]])
    return jnp.array([[a, -b, t[0]], [b, a, t[1]], [0.0, 0.0, 1.0]], p0.dtype)


def similarity_umeyama(p0: Array, p1: Array, weights: Array | None = None) -> Array:
    """Closed-form least-squares 2D similarity p0 -> p1 (Umeyama/Procrustes).

    Args:
      p0, p1: [N, 2]; weights: optional [N] (0 excludes a pair).
    Returns [3, 3] similarity matrix.
    """
    w = jnp.ones(p0.shape[0], p0.dtype) if weights is None else weights
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu0 = jnp.sum(p0 * w[:, None], 0) / wsum
    mu1 = jnp.sum(p1 * w[:, None], 0) / wsum
    q0 = p0 - mu0
    q1 = p1 - mu1
    # Complex least squares: s*e^{i t} = sum(conj(q0) q1) / sum(|q0|^2).
    denom = jnp.maximum(jnp.sum(w * jnp.sum(q0 * q0, -1)), 1e-12)
    a = jnp.sum(w * (q0[:, 0] * q1[:, 0] + q0[:, 1] * q1[:, 1])) / denom
    b = jnp.sum(w * (q0[:, 0] * q1[:, 1] - q0[:, 1] * q1[:, 0])) / denom
    t = mu1 - jnp.array([a * mu0[0] - b * mu0[1], b * mu0[0] + a * mu0[1]])
    return jnp.array([[a, -b, t[0]], [b, a, t[1]], [0.0, 0.0, 1.0]], p0.dtype)


def apply_homography(H: Array, pts: Array) -> Array:
    """[..., N, 2] -> warped [..., N, 2] (ref homo_trans, evaluation.py:30-36)."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = ph @ jnp.swapaxes(H, -1, -2)
    return out[..., :2] / jnp.where(jnp.abs(out[..., 2:]) > 1e-12,
                                    out[..., 2:], 1e-12)


def _transfer_error(H, pts0, pts1):
    return jnp.sum((apply_homography(H, pts0) - pts1) ** 2, axis=-1)


@partial(jax.jit, static_argnames=("num_hypotheses", "model"))
def ransac_homography(pts0: Array, pts1: Array, valid: Array,
                      threshold_px: float, rng: Array,
                      num_hypotheses: int = 256, model: str = "homography"):
    """Fixed-budget RANSAC for a planar model.

    Args:
      pts0, pts1: [N, 2] pixel correspondences (padded).
      valid: [N] bool.
      threshold_px: inlier threshold on the forward transfer error.
      model: 'homography' (4-pt DLT) | 'similarity' (2-pt).

    Returns dict: H [3,3], inliers [N], num_inliers, ok.
    """
    n = pts0.shape[0]
    tsq = jnp.asarray(threshold_px, pts0.dtype) ** 2
    sample_size = 4 if model == "homography" else 2

    g = jax.random.gumbel(rng, (num_hypotheses, n))
    scores = g + jnp.where(valid, 0.0, -1e9)[None, :]
    _, idx = jax.lax.top_k(scores, sample_size)
    s0 = pts0[idx]
    s1 = pts1[idx]
    if model == "homography":
        Hs = jax.vmap(homography_dlt)(s0, s1)
    else:
        Hs = jax.vmap(similarity_from_2pts)(s0, s1)

    errs = jax.vmap(lambda H: _transfer_error(H, pts0, pts1))(Hs)
    inl = (errs < tsq) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    H, inliers = Hs[best], inl[best]

    # Refit on inliers (homography only; similarity keeps the minimal fit).
    if model == "homography":
        def refit(H, inliers):
            w = inliers.astype(pts0.dtype)
            H_new = homography_dlt(pts0, pts1, w)
            inl_new = (_transfer_error(H_new, pts0, pts1) < tsq) & valid
            better = jnp.sum(inl_new) >= jnp.sum(inliers)
            return (jnp.where(better, H_new, H),
                    jnp.where(better, inl_new, inliers))

        for _ in range(2):
            H, inliers = refit(H, inliers)

    min_pts = sample_size
    return {
        "H": H,
        "inliers": inliers,
        "num_inliers": jnp.sum(inliers),
        "ok": jnp.sum(inliers) >= min_pts,
    }
