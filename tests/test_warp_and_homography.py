"""crop_resize warps, keypoint unwarping, homography/similarity RANSAC."""
import jax
import jax.numpy as jnp
import numpy as np

from oetr_tpu.geometry.homography import (apply_homography, homography_dlt,
                                          ransac_homography,
                                          similarity_from_2pts)
from oetr_tpu.ops.warp import crop_resize, unwarp_keypoints


def test_crop_resize_identity_box():
    img = np.zeros((32, 32, 1), np.float32)
    img[10:20, 5:15] = 1.0
    box = jnp.asarray([0.0, 0.0, 32.0, 32.0])
    canvas, ratio, valid = crop_resize(jnp.asarray(img), box, (32, 32))
    np.testing.assert_allclose(float(ratio), 1.0)
    np.testing.assert_allclose(np.asarray(canvas), img, atol=1e-5)


def test_crop_resize_upscale_and_unwarp(rng):
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    box = jnp.asarray([16.0, 8.0, 48.0, 40.0])      # 32x32 crop
    canvas, ratio, valid = crop_resize(img, box, (64, 64))
    np.testing.assert_allclose(float(ratio), 2.0)
    # Center pixel of canvas should equal the crop's center area.
    # Unwarp a canvas point back: canvas (32, 32) -> image (32, 24).
    kp = unwarp_keypoints(jnp.asarray([[[32.0, 32.0]]]),
                          box[None], jnp.asarray([ratio]))
    np.testing.assert_allclose(np.asarray(kp[0, 0]), [32.0, 24.0], atol=1e-5)


def test_crop_resize_aspect_preserved():
    img = jnp.ones((64, 64, 1), jnp.float32)
    box = jnp.asarray([0.0, 0.0, 64.0, 32.0])       # wide box
    canvas, ratio, valid = crop_resize(img, box, (64, 64))
    np.testing.assert_allclose(float(ratio), 1.0)   # limited by width
    v = np.asarray(valid)
    assert v[:31].all() and not v[33:].any()        # bottom half padded


def test_homography_dlt_exact(rng):
    H_gt = np.array([[1.2, 0.1, 5.0], [-0.05, 0.9, -3.0], [1e-4, 2e-4, 1.0]])
    pts0 = rng.uniform(0, 100, (16, 2))
    pts1 = np.asarray(apply_homography(jnp.asarray(H_gt), jnp.asarray(pts0)))
    H = homography_dlt(jnp.asarray(pts0), jnp.asarray(pts1))
    back = np.asarray(apply_homography(H, jnp.asarray(pts0)))
    np.testing.assert_allclose(back, pts1, atol=1e-6)


def test_similarity_from_2pts():
    # 90-degree rotation + scale 2 + translation (3, 4).
    p0 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
    p1 = jnp.asarray([[3.0, 4.0], [3.0, 6.0]])
    S = similarity_from_2pts(p0, p1)
    out = np.asarray(apply_homography(S, jnp.asarray([[0.0, 1.0]])))
    np.testing.assert_allclose(out[0], [1.0, 4.0], atol=1e-6)


def test_ransac_homography_with_outliers(rng):
    H_gt = np.array([[1.1, 0.05, 10.0], [0.02, 0.95, -5.0], [5e-5, 1e-4, 1.0]])
    n = 200
    pts0 = rng.uniform(0, 300, (n, 2))
    pts1 = np.array(apply_homography(jnp.asarray(H_gt), jnp.asarray(pts0)))
    pts1 += rng.normal(0, 0.5, pts1.shape)
    out_idx = rng.choice(n, 60, replace=False)
    pts1[out_idx] = rng.uniform(0, 300, (60, 2))
    res = ransac_homography(jnp.asarray(pts0.astype(np.float32)),
                            jnp.asarray(pts1.astype(np.float32)),
                            jnp.ones(n, bool), 3.0, jax.random.key(0))
    assert bool(res["ok"])
    assert int(res["num_inliers"]) > 110
    # Reprojection accuracy on the clean points.
    clean = np.setdiff1d(np.arange(n), out_idx)
    proj = np.asarray(apply_homography(res["H"], jnp.asarray(pts0[clean])))
    err = np.linalg.norm(proj - np.asarray(
        apply_homography(jnp.asarray(H_gt), jnp.asarray(pts0[clean]))), axis=-1)
    assert np.median(err) < 1.5, np.median(err)


def test_ransac_similarity(rng):
    n = 100
    theta = np.radians(30)
    S_gt = np.array([[2 * np.cos(theta), -2 * np.sin(theta), 7.0],
                     [2 * np.sin(theta), 2 * np.cos(theta), -2.0],
                     [0, 0, 1.0]])
    pts0 = rng.uniform(0, 100, (n, 2))
    pts1 = np.array(apply_homography(jnp.asarray(S_gt), jnp.asarray(pts0)))
    pts1[rng.choice(n, 20, replace=False)] = rng.uniform(0, 100, (20, 2))
    res = ransac_homography(jnp.asarray(pts0.astype(np.float32)),
                            jnp.asarray(pts1.astype(np.float32)),
                            jnp.ones(n, bool), 2.0, jax.random.key(1),
                            model="similarity")
    assert int(res["num_inliers"]) >= 75


def test_crop_resize_matmul_matches_gather(rng):
    """The separable-matmul fast path (MXU) must reproduce the gather
    formulation exactly (same clamped-bilinear arithmetic per axis)."""
    from oetr_tpu.ops.warp import crop_resize_gather

    img = jnp.asarray(rng.random((40, 56, 3), dtype=np.float32))
    for box in ([3.2, 5.5, 38.9, 31.0], [0.0, 0.0, 56.0, 40.0],
                [10.0, 12.0, 14.5, 30.0]):
        b = jnp.asarray(box, jnp.float32)
        c_mm, r_mm, v_mm = crop_resize(img, b, (48, 32))
        c_g, r_g, v_g = crop_resize_gather(img, b, (48, 32))
        np.testing.assert_allclose(float(r_mm), float(r_g), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(v_mm), np.asarray(v_g))
        np.testing.assert_allclose(np.asarray(c_mm), np.asarray(c_g),
                                   atol=2e-5)
