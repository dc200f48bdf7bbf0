"""Two-view epipolar geometry as pure jnp functions.

Replaces the numpy/OpenCV helpers of the reference
(/root/reference/dloc/evaluate/utils/evaluation.py:243-282) with batched,
jit-friendly equivalents. All functions accept arbitrary leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def to_homogeneous(points: Array) -> Array:
    """[..., N, d] -> [..., N, d+1] by appending ones.

    Ref: dloc/evaluate/utils/evaluation.py:243-244.
    """
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def normalize_keypoints(kpts: Array, K: Array) -> Array:
    """Pixel keypoints -> normalized camera coordinates.

    Ref semantics: (kpts - K[[0,1],[2,2]]) / K[[0,1],[0,1]]
    (dloc/evaluate/utils/evaluation.py:216-217).

    Args:
      kpts: [..., N, 2]; K: [..., 3, 3].
    """
    center = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    focal = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    return (kpts - center[..., None, :]) / focal[..., None, :]


def unnormalize_keypoints(kpts: Array, K: Array) -> Array:
    """Inverse of :func:`normalize_keypoints`."""
    center = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    focal = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    return kpts * focal[..., None, :] + center[..., None, :]


def skew(t: Array) -> Array:
    """Skew-symmetric cross-product matrix [t]_x for [..., 3] vectors.

    Ref ordering: dloc/evaluate/utils/evaluation.py:253-254 builds
    [[0,-t2,t1],[t2,0,-t0],[-t1,t0,0]].
    """
    t0, t1, t2 = t[..., 0], t[..., 1], t[..., 2]
    z = jnp.zeros_like(t0)
    rows = [
        jnp.stack([z, -t2, t1], axis=-1),
        jnp.stack([t2, z, -t0], axis=-1),
        jnp.stack([-t1, t0, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def essential_from_pose(T_0to1: Array) -> Array:
    """E = [t]_x R from a 4x4 relative pose. Ref: evaluation.py:253-255."""
    return skew(T_0to1[..., :3, 3]) @ T_0to1[..., :3, :3]


def symmetric_epipolar_error(kpts0: Array, kpts1: Array, T_0to1: Array,
                             K0: Array, K1: Array) -> Array:
    """Squared symmetric epipolar distance per correspondence.

    Bit-for-bit the reference formula (dloc/evaluate/utils/evaluation.py:247-262)
    including its idiosyncratic normalizer ``1/(Ep0_x + Ep0_y) + 1/(Etp1_x +
    Etp1_y)`` (no squares) — benchmark parity requires matching it exactly
    because the precision metric thresholds this value at 5e-4.

    Args:
      kpts0, kpts1: [..., N, 2] pixel coords; T_0to1: [..., 4, 4];
      K0, K1: [..., 3, 3].
    Returns:
      [..., N] errors.
    """
    k0 = to_homogeneous(normalize_keypoints(kpts0, K0))
    k1 = to_homogeneous(normalize_keypoints(kpts1, K1))
    E = essential_from_pose(T_0to1)
    Ep0 = k0 @ jnp.swapaxes(E, -1, -2)          # [..., N, 3]
    p1Ep0 = jnp.sum(k1 * Ep0, axis=-1)          # [..., N]
    Etp1 = k1 @ E                                # [..., N, 3]
    d = p1Ep0 ** 2 * (1.0 / (Ep0[..., 0] + Ep0[..., 1])
                      + 1.0 / (Etp1[..., 0] + Etp1[..., 1]))
    return d


def sampson_error(kpts0: Array, kpts1: Array, E: Array) -> Array:
    """First-order geometric (Sampson) distance for *normalized* coords.

    Standard robust residual used by our RANSAC scoring (the reference
    delegates this to cv2.findEssentialMat's internal scoring,
    evaluation.py:219-224).

    Args:
      kpts0, kpts1: [..., N, 2] normalized camera coords; E: [..., 3, 3].
    Returns:
      [..., N] squared Sampson distances.
    """
    k0 = to_homogeneous(kpts0)
    k1 = to_homogeneous(kpts1)
    Ep0 = k0 @ jnp.swapaxes(E, -1, -2)
    Etp1 = k1 @ E
    p1Ep0 = jnp.sum(k1 * Ep0, axis=-1)
    denom = Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2 + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    return p1Ep0 ** 2 / jnp.maximum(denom, 1e-12)


def angle_error_mat(R1: Array, R2: Array) -> Array:
    """Angular distance (degrees) between rotations. Ref: evaluation.py:265-268."""
    cos = (jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1) - 1) / 2
    cos = jnp.clip(cos, -1.0, 1.0)
    return jnp.degrees(jnp.abs(jnp.arccos(cos)))


def angle_error_vec(v1: Array, v2: Array) -> Array:
    """Angle (degrees) between vectors. Ref: evaluation.py:271-273."""
    n = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    cos = jnp.sum(v1 * v2, axis=-1) / jnp.maximum(n, 1e-15)
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def pose_error(T_0to1: Array, R: Array, t: Array) -> tuple[Array, Array]:
    """Angular (t, R) errors vs GT relative pose, with the E-matrix
    translation-sign ambiguity folded via min(err, 180-err).

    Ref: compute_pose_error, dloc/evaluate/utils/evaluation.py:276-282.
    Returns (error_t_deg, error_R_deg).
    """
    R_gt = T_0to1[..., :3, :3]
    t_gt = T_0to1[..., :3, 3]
    error_t = angle_error_vec(t, t_gt)
    error_t = jnp.minimum(error_t, 180.0 - error_t)
    error_R = angle_error_mat(R, R_gt)
    return error_t, error_R


def project_points(xyz: Array, K: Array) -> Array:
    """Project camera-frame 3D points to pixels. [..., N, 3] -> [..., N, 2]."""
    uv = xyz @ jnp.swapaxes(K, -1, -2)
    return uv[..., :2] / jnp.maximum(uv[..., 2:3], 1e-12)


def transform_points(T: Array, xyz: Array) -> Array:
    """Apply a 4x4 rigid transform to [..., N, 3] points."""
    return xyz @ jnp.swapaxes(T[..., :3, :3], -1, -2) + T[..., None, :3, 3]
