"""Epipolar geometry vs numpy transcription of the reference formulas
(dloc/evaluate/utils/evaluation.py:243-282)."""
import jax.numpy as jnp
import numpy as np

from oetr_tpu.geometry import (angle_error_mat, angle_error_vec,
                               essential_from_pose, normalize_keypoints,
                               pose_error, sampson_error,
                               symmetric_epipolar_error, to_homogeneous,
                               unnormalize_keypoints)


def _np_epipolar_error(kpts0, kpts1, T_0to1, K0, K1):
    # Direct transcription of the reference formula (evaluation.py:247-262).
    kpts0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    kpts1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    kpts0 = np.concatenate([kpts0, np.ones_like(kpts0[:, :1])], -1)
    kpts1 = np.concatenate([kpts1, np.ones_like(kpts1[:, :1])], -1)
    t0, t1, t2 = T_0to1[:3, 3]
    t_skew = np.array([[0, -t2, t1], [t2, 0, -t0], [-t1, t0, 0]])
    E = t_skew @ T_0to1[:3, :3]
    Ep0 = kpts0 @ E.T
    p1Ep0 = np.sum(kpts1 * Ep0, -1)
    Etp1 = kpts1 @ E
    return p1Ep0 ** 2 * (1.0 / (Ep0[:, 0] + Ep0[:, 1]) +
                         1.0 / (Etp1[:, 0] + Etp1[:, 1]))


def _random_pose(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def test_symmetric_epipolar_matches_reference(rng):
    K = np.array([[800.0, 0, 320], [0, 820.0, 240], [0, 0, 1]])
    T = _random_pose(rng)
    k0 = rng.uniform(0, 640, (64, 2))
    k1 = rng.uniform(0, 480, (64, 2))
    ours = symmetric_epipolar_error(jnp.asarray(k0), jnp.asarray(k1),
                                    jnp.asarray(T), jnp.asarray(K),
                                    jnp.asarray(K))
    ref = _np_epipolar_error(k0, k1, T, K, K)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-8)


def test_normalize_roundtrip(rng):
    K = np.array([[700.0, 0, 300], [0, 710.0, 250], [0, 0, 1]])
    k = rng.uniform(0, 600, (32, 2))
    n = normalize_keypoints(jnp.asarray(k), jnp.asarray(K))
    back = unnormalize_keypoints(n, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(back), k, rtol=1e-6)


def test_angle_errors(rng):
    from scipy.spatial.transform import Rotation
    r = Rotation.from_euler("xyz", [10, 0, 0], degrees=True)
    R1 = np.eye(3)
    R2 = r.as_matrix()
    err = angle_error_mat(jnp.asarray(R1), jnp.asarray(R2))
    np.testing.assert_allclose(float(err), 10.0, atol=1e-4)

    v1 = np.array([1.0, 0.0, 0.0])
    v2 = np.array([np.cos(np.radians(30)), np.sin(np.radians(30)), 0.0])
    np.testing.assert_allclose(
        float(angle_error_vec(jnp.asarray(v1), jnp.asarray(v2))), 30.0, atol=1e-4)


def test_pose_error_translation_ambiguity(rng):
    T = np.eye(4)
    T[:3, 3] = [1.0, 0.0, 0.0]
    # Flipped translation should register a 0 error (min(err, 180-err)).
    err_t, err_R = pose_error(jnp.asarray(T), jnp.asarray(np.eye(3)),
                              jnp.asarray(np.array([-1.0, 0.0, 0.0])))
    np.testing.assert_allclose(float(err_t), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(err_R), 0.0, atol=1e-4)


def test_epipolar_constraint_zero_for_true_matches(rng):
    # Generate a true two-view setup; epipolar error of exact matches ~ 0.
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    T_0to1 = _random_pose(rng)
    T_0to1[:3, 3] /= np.linalg.norm(T_0to1[:3, 3])
    pts = rng.uniform(-2, 2, (128, 3)) + np.array([0, 0, 6.0])
    uv0 = (pts / pts[:, 2:]) @ K.T
    p1 = pts @ T_0to1[:3, :3].T + T_0to1[:3, 3]
    uv1 = (p1 / p1[:, 2:]) @ K.T
    err = symmetric_epipolar_error(jnp.asarray(uv0[:, :2]),
                                   jnp.asarray(uv1[:, :2]),
                                   jnp.asarray(T_0to1), jnp.asarray(K),
                                   jnp.asarray(K))
    assert np.max(np.abs(np.asarray(err))) < 1e-6

    # Sampson error on normalized coords should also vanish.
    E = essential_from_pose(jnp.asarray(T_0to1))
    k0n = normalize_keypoints(jnp.asarray(uv0[:, :2]), jnp.asarray(K))
    k1n = normalize_keypoints(jnp.asarray(uv1[:, :2]), jnp.asarray(K))
    s = sampson_error(k0n, k1n, E)
    assert np.max(np.abs(np.asarray(s))) < 1e-8
