"""Overlap-box warping vs a numpy transcription of the reference routine
(numpy_overlap_box, src/datasets/utils.py:140-202)."""
import jax.numpy as jnp
import numpy as np

from oetr_tpu.geometry import overlap_bbox


def _np_overlap_box(K1, depth1, pose1, bbox1, ratio1, K2, depth2, pose2,
                    bbox2, ratio2):
    """Transcription of the reference's formula with its x/y bounds bug fixed
    (compare x against width, y against height); identical on square crops."""
    mask1 = np.where(depth1 > 0)
    u1, v1 = mask1[1], mask1[0]
    Z1 = depth1[v1, u1]
    x1 = (u1 + bbox1[1] + 0.5) / ratio1[1]
    y1 = (v1 + bbox1[0] + 0.5) / ratio1[0]
    X1 = (x1 - K1[0, 2]) * (Z1 / K1[0, 0])
    Y1 = (y1 - K1[1, 2]) * (Z1 / K1[1, 1])
    XYZ1_hom = np.concatenate([X1.reshape(1, -1), Y1.reshape(1, -1),
                               Z1.reshape(1, -1),
                               np.ones_like(Z1.reshape(1, -1))], axis=0)
    XYZ2_hom = pose2 @ np.linalg.inv(pose1) @ XYZ1_hom
    XYZ2 = XYZ2_hom[:-1, :] / XYZ2_hom[-1, :].reshape(1, -1)
    uv2_hom = K2 @ XYZ2
    uv2 = uv2_hom[:-1, :] / uv2_hom[-1, :].reshape(1, -1)
    h, w = depth2.shape
    u2 = uv2[0, :] * ratio2[1] - bbox2[1] - 0.5
    v2 = uv2[1, :] * ratio2[0] - bbox2[0] - 0.5
    uv2 = np.concatenate([u2.reshape(1, -1), v2.reshape(1, -1)], axis=0)
    i = uv2[0, :].astype(int)
    j = uv2[1, :].astype(int)
    valid = (i >= 0) & (j >= 0) & (i < w) & (j < h)
    valid_uv1 = np.stack((u1[valid], v1[valid])).astype(int)
    valid_uv2 = uv2[:, valid].astype(int)
    Z2 = depth2[valid_uv2[1], valid_uv2[0]]
    inlier = np.abs(XYZ2[2, valid] - Z2) < 0.5
    valid_uv1 = valid_uv1[:, inlier]
    valid_uv2 = valid_uv2[:, inlier]
    if valid_uv1.shape[1] == 0:
        return np.zeros(4), np.zeros(4), False
    box1 = np.array([valid_uv1[0].min(), valid_uv1[1].min(),
                     valid_uv1[0].max(), valid_uv1[1].max()])
    box2 = np.array([valid_uv2[0].min(), valid_uv2[1].min(),
                     valid_uv2[0].max(), valid_uv2[1].max()])
    return box1, box2, True


def _synthetic_scene(rng, h=48, w=48, shift=(5.3, 3.7)):
    # Non-integer pixel shift: integer shifts put warped pixels exactly on
    # integer boundaries where int-truncation is float-op-order sensitive
    # (the reference itself flips there under noise).
    """Fronto-parallel plane at z=10 viewed by two translated cameras."""
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]])
    depth1 = np.full((h, w), 10.0)
    depth1[:4, :] = 0.0  # some invalid-depth pixels
    depth2 = np.full((h, w), 10.0)
    pose1 = np.eye(4)
    pose2 = np.eye(4)
    pose2[:3, 3] = [shift[0] * 10.0 / 50.0, shift[1] * 10.0 / 50.0, 0.0]
    # camera2 translated so the plane shifts by `shift` pixels.
    return K, depth1, pose1, depth2, pose2


def test_overlap_matches_numpy_reference(rng):
    K, depth1, pose1, depth2, pose2 = _synthetic_scene(rng)
    crop = np.zeros(2)
    ratio = np.ones(2)
    ref_b1, ref_b2, ref_valid = _np_overlap_box(
        K, depth1, pose1, crop, ratio, K, depth2, pose2, crop, ratio)
    b1, m1, b2, m2, valid = overlap_bbox(
        jnp.asarray(K), jnp.asarray(depth1), jnp.asarray(pose1),
        jnp.asarray(crop), jnp.asarray(ratio), jnp.asarray(K),
        jnp.asarray(depth2), jnp.asarray(pose2), jnp.asarray(crop),
        jnp.asarray(ratio))
    assert bool(valid) == ref_valid
    np.testing.assert_allclose(np.asarray(b1), ref_b1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), ref_b2, atol=1e-5)


def test_overlap_with_crop_and_ratio(rng):
    K, depth1, pose1, depth2, pose2 = _synthetic_scene(rng)
    crop1 = np.array([4.0, 6.0])
    crop2 = np.array([2.0, 1.0])
    ratio1 = np.array([0.8, 0.8])
    ratio2 = np.array([1.2, 1.2])
    ref_b1, ref_b2, ref_valid = _np_overlap_box(
        K, depth1, pose1, crop1, ratio1, K, depth2, pose2, crop2, ratio2)
    b1, m1, b2, m2, valid = overlap_bbox(
        jnp.asarray(K), jnp.asarray(depth1), jnp.asarray(pose1),
        jnp.asarray(crop1), jnp.asarray(ratio1), jnp.asarray(K),
        jnp.asarray(depth2), jnp.asarray(pose2), jnp.asarray(crop2),
        jnp.asarray(ratio2))
    assert bool(valid) == ref_valid
    if ref_valid:
        np.testing.assert_allclose(np.asarray(b1), ref_b1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b2), ref_b2, atol=1e-5)


def test_overlap_occlusion_and_empty(rng):
    K, depth1, pose1, depth2, pose2 = _synthetic_scene(rng)
    # Make image2's depth wildly different -> occlusion check kills everything.
    depth2_far = np.full_like(depth2, 100.0)
    b1, m1, b2, m2, valid = overlap_bbox(
        jnp.asarray(K), jnp.asarray(depth1), jnp.asarray(pose1),
        jnp.asarray(np.zeros(2)), jnp.asarray(np.ones(2)), jnp.asarray(K),
        jnp.asarray(depth2_far), jnp.asarray(pose2), jnp.asarray(np.zeros(2)),
        jnp.asarray(np.ones(2)))
    assert not bool(valid)
    np.testing.assert_allclose(np.asarray(b1), np.zeros(4))
    assert float(jnp.sum(m1)) == 0.0


def test_overlap_masks_consistent(rng):
    K, depth1, pose1, depth2, pose2 = _synthetic_scene(rng)
    b1, m1, b2, m2, valid = overlap_bbox(
        jnp.asarray(K), jnp.asarray(depth1), jnp.asarray(pose1),
        jnp.asarray(np.zeros(2)), jnp.asarray(np.ones(2)), jnp.asarray(K),
        jnp.asarray(depth2), jnp.asarray(pose2), jnp.asarray(np.zeros(2)),
        jnp.asarray(np.ones(2)))
    assert bool(valid)
    m1np, m2np = np.asarray(m1), np.asarray(m2)
    # mask1 pixels live inside box1; mask2 pixels inside box2.
    ys, xs = np.nonzero(m1np)
    b1np = np.asarray(b1)
    assert xs.min() >= b1np[0] and xs.max() <= b1np[2]
    assert ys.min() >= b1np[1] and ys.max() <= b1np[3]
    assert m2np.sum() > 0
