"""NMS / top-k / descriptor sampling / Sinkhorn ops."""
import jax.numpy as jnp
import numpy as np

from oetr_tpu.ops import (bilinear_sample, extract_matches,
                          log_optimal_transport, remove_borders,
                          sample_descriptors, simple_nms, topk_keypoints)


def test_simple_nms_suppresses_neighbors():
    s = np.zeros((1, 16, 16), np.float32)
    s[0, 5, 5] = 1.0
    s[0, 5, 7] = 0.8   # within radius 2 of the stronger peak
    s[0, 12, 12] = 0.9
    out = np.asarray(simple_nms(jnp.asarray(s), radius=2))
    assert out[0, 5, 5] == 1.0
    assert out[0, 5, 7] == 0.0
    assert out[0, 12, 12] == 0.9


def test_remove_borders():
    s = np.ones((1, 10, 10), np.float32)
    out = np.asarray(remove_borders(jnp.asarray(s), border=3))
    assert out[0, :3].sum() == 0 and out[0, -3:].sum() == 0
    assert out[0, 3:7, 3:7].min() == 1.0


def test_topk_keypoints_threshold_and_coords():
    s = np.zeros((1, 8, 8), np.float32)
    s[0, 2, 3] = 0.9
    s[0, 6, 1] = 0.5
    s[0, 7, 7] = 0.001   # below threshold
    xy, vals, valid = topk_keypoints(jnp.asarray(s), k=4, threshold=0.01)
    xy, vals, valid = map(np.asarray, (xy, vals, valid))
    assert valid[0].sum() == 2
    assert (xy[0, 0] == [3, 2]).all()   # (x, y)
    assert (xy[0, 1] == [1, 6]).all()
    assert not valid[0, 2] and not valid[0, 3]


def test_bilinear_sample_exact_and_midpoint():
    grid = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    out = np.asarray(bilinear_sample(grid, jnp.asarray([[1.0, 2.0]])))
    assert out[0, 0] == 9.0  # row 2, col 1
    mid = np.asarray(bilinear_sample(grid, jnp.asarray([[0.5, 0.5]])))
    assert abs(mid[0, 0] - np.mean([0, 1, 4, 5])) < 1e-5


def test_sample_descriptors_unit_norm(rng):
    dmap = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(0, 63, (1, 10, 2)).astype(np.float32))
    d = np.asarray(sample_descriptors(dmap, xy, stride=8))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_sinkhorn_doubly_stochastic(rng):
    scores = jnp.asarray(rng.normal(size=(2, 6, 5)).astype(np.float32))
    Z = log_optimal_transport(scores, jnp.asarray(1.0), iters=50)
    P = np.exp(np.asarray(Z))
    # Row sums: each of the 6 real rows has mass 1; col dustbin row has 6...
    # After un-normalization, total mass = m + n.
    np.testing.assert_allclose(P.sum((-2, -1)), 6 + 5, rtol=1e-3)
    np.testing.assert_allclose(P[:, :-1].sum(-1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(P[:, :, :-1].sum(-2), 1.0, rtol=1e-3)


def test_sinkhorn_masked_padding(rng):
    scores = jnp.asarray(rng.normal(size=(1, 6, 5)).astype(np.float32))
    m0 = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], bool))
    m1 = jnp.asarray(np.array([[1, 1, 1, 0, 0]], bool))
    Z = log_optimal_transport(scores, jnp.asarray(0.5), iters=50, mask0=m0,
                              mask1=m1)
    P = np.exp(np.asarray(Z))
    # Padded rows/cols carry ~no mass (outside the dustbin corner).
    assert P[0, 4:6, :-1].sum() < 1e-4
    assert P[0, :-1, 3:5].sum() < 1e-4
    # Valid rows sum to 1.
    np.testing.assert_allclose(P[0, :4].sum(-1), 1.0, rtol=1e-3)


def test_extract_matches_mutual_and_threshold():
    # Construct a log-assignment favoring 0<->1, 1<->0 strongly; 2 weak.
    P = np.full((1, 4, 4), 1e-6)
    P[0, 0, 1] = 0.9
    P[0, 1, 0] = 0.8
    P[0, 2, 2] = 0.1  # below threshold 0.2
    Z = jnp.asarray(np.log(P))
    m0, m1, s0, s1 = extract_matches(Z, threshold=0.2)
    m0 = np.asarray(m0)
    assert m0[0, 0] == 1 and m0[0, 1] == 0
    assert m0[0, 2] == -1  # below threshold


def test_refine_keypoints_recovers_subpixel_peak():
    """A Gaussian peak at a non-integer position: the 3x3 centroid moves
    the integer argmax toward the true sub-pixel mode."""
    import jax.numpy as jnp

    from oetr_tpu.ops.nms import refine_keypoints

    h = w = 32
    true = (14.3, 9.6)                     # (x, y)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    score = np.exp(-((xx - true[0]) ** 2 + (yy - true[1]) ** 2) / 3.0)
    xy = jnp.asarray([[[14.0, 10.0]]], jnp.float32)   # integer argmax
    refined = np.asarray(refine_keypoints(jnp.asarray(score)[None], xy))[0, 0]
    assert abs(refined[0] - true[0]) < 0.25, refined
    assert abs(refined[1] - true[1]) < 0.35, refined
    # Never leaves the cell.
    assert abs(refined[0] - 14.0) <= 0.5 and abs(refined[1] - 10.0) <= 0.5


def test_tiled_topk_matches_dense_on_nmsed_map():
    """Round-5 tiled top-k (nms_tile): on an NMS-suppressed map the
    tile-reduced candidate set must select exactly the dense top-k
    (same coords, scores, validity)."""
    rng = np.random.default_rng(11)
    s = jnp.asarray(rng.uniform(0, 1, (2, 96, 96)).astype(np.float32))
    nmsed = remove_borders(simple_nms(s, radius=4), 4)
    xy_d, v_d, ok_d = topk_keypoints(nmsed, 64, 0.0)
    xy_t, v_t, ok_t = topk_keypoints(nmsed, 64, 0.0, nms_tile=5)
    np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_t))
    sel = np.asarray(ok_d)
    np.testing.assert_allclose(np.asarray(v_d)[sel], np.asarray(v_t)[sel],
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(xy_d)[sel],
                                  np.asarray(xy_t)[sel])


def test_tiled_topk_small_map_falls_back():
    """Candidate set smaller than k -> dense path (identical result)."""
    rng = np.random.default_rng(12)
    s = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)).astype(np.float32))
    nmsed = simple_nms(s, radius=4)
    xy_d, v_d, ok_d = topk_keypoints(nmsed, 32, 0.0)
    xy_t, v_t, ok_t = topk_keypoints(nmsed, 32, 0.0, nms_tile=5)
    np.testing.assert_array_equal(np.asarray(xy_d), np.asarray(xy_t))
    np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_t))
