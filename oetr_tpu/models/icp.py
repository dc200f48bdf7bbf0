"""ICP contour matcher — foreground contours to 2D rigid/similarity pose.

Parity with /root/reference/dloc/core/matchers/icp.py:16-123: extract
foreground contours (host, cv2), then iterate nearest-neighbor
association + robust similarity estimation until convergence. The inner
RANSAC (reference: cv2.estimateAffinePartial2D per iteration, icp.py:97)
is our batched similarity RANSAC (geometry/homography.py). The
reference's ``get_foreground_mask`` imports a *missing* module
(dloc/core/utils/utils.py:1019-1030); here a self-contained
threshold+morphology mask is provided.
"""
from __future__ import annotations

import cv2

import jax.numpy as jnp
import numpy as np

from ..geometry.homography import apply_homography, similarity_umeyama


def foreground_mask(image_u8: np.ndarray, min_area: float = 20000.0,
                    connectivity: int = 4) -> np.ndarray:
    """Binary foreground mask via Otsu threshold + small-component removal
    (self-contained replacement for the reference's missing
    ImagePreprocess dependency)."""
    if image_u8.ndim == 3:
        gray = cv2.cvtColor(image_u8, cv2.COLOR_BGR2GRAY)
    else:
        gray = image_u8
    _, mask = cv2.threshold(gray, 0, 255,
                            cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(
        mask, connectivity=connectivity)
    keep = np.zeros_like(mask)
    for i in range(1, n):
        if stats[i, cv2.CC_STAT_AREA] >= min_area:
            keep[labels == i] = 255
    return keep


def contour_points(mask: np.ndarray, max_points: int = 2048) -> np.ndarray:
    """Subsampled contour point set [N, 2] (x, y) float32."""
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    if not contours:
        return np.zeros((0, 2), np.float32)
    pts = np.concatenate([c.reshape(-1, 2) for c in contours]).astype(
        np.float32)
    if len(pts) > max_points:
        idx = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts = pts[idx]
    return pts


def icp_register(pts0: np.ndarray, pts1: np.ndarray, iters: int = 20,
                 threshold_px: float = 20.0, rng_seed: int = 0) -> dict:
    """KNN-ICP with robust similarity refit per iteration
    (ref: ICPRegister.icp, icp.py:71-118). Estimates T mapping pts0->pts1.

    Returns dict: T [3, 3], rmse, converged.
    """
    if len(pts0) < 2 or len(pts1) < 2:
        return {"T": np.eye(3), "rmse": np.inf, "converged": False}
    from scipy.spatial import cKDTree
    T = np.eye(3)
    cur = pts0.copy()
    prev_err = np.inf
    tree = cKDTree(pts1)
    for _ in range(iters):
        dist, idx = tree.query(cur)
        tgt = pts1[idx]
        # Trimmed associations: reject beyond 3x median distance (and the
        # hard threshold), then closed-form Umeyama similarity — the
        # classic robust-ICP inner solve (stabler than per-iteration
        # minimal-sample RANSAC on symmetric contours).
        med = np.median(dist) if len(dist) else 0.0
        keep = (dist <= max(3.0 * med, 1e-6)) & (dist <= threshold_px * 3)
        if keep.sum() < 2:
            break
        dT = np.asarray(similarity_umeyama(
            jnp.asarray(cur.astype(np.float32)),
            jnp.asarray(tgt.astype(np.float32)),
            jnp.asarray(keep.astype(np.float32))))
        cur = np.array(apply_homography(jnp.asarray(dT), jnp.asarray(cur)))
        T = dT @ T
        err = float(np.mean(dist[keep]))
        if abs(prev_err - err) < 1e-3:
            prev_err = err
            break
        prev_err = err
    return {"T": T, "rmse": prev_err, "converged": np.isfinite(prev_err)}


def icp_match(image0_u8: np.ndarray, image1_u8: np.ndarray,
              min_area: float = 20000.0) -> dict:
    """Full contour-ICP pipeline (ref: ICPRegister, icp.py:16-70).

    Returns dict: T_0to1 [3, 3] 2D similarity, rmse, converged.
    """
    m0 = foreground_mask(image0_u8, min_area)
    m1 = foreground_mask(image1_u8, min_area)
    c0 = contour_points(m0)
    c1 = contour_points(m1)
    out = icp_register(c0, c1)
    out["contours0"] = c0
    out["contours1"] = c1
    return out
