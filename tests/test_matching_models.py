"""SuperPoint / NN matcher / SuperGlue / LoFTR: contracts + identity-pair
sanity (each model should match an image with itself)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.models import (LoFTR, SuperGlue, SuperPoint,
                             nearest_neighbor_match, registry)


@pytest.fixture(scope="module")
def checker_image(rng=None):
    r = np.random.default_rng(3)
    img = r.uniform(0, 0.2, (1, 64, 64, 1)).astype(np.float32)
    # Strong corners to detect.
    for y, x in [(16, 16), (16, 48), (48, 16), (48, 48), (32, 32)]:
        img[0, y - 2:y + 2, x - 2:x + 2, 0] = 1.0
    return jnp.asarray(img)


def test_superpoint_contract(checker_image):
    sp = SuperPoint(max_keypoints=64, keypoint_threshold=1e-4)
    params = sp.init(jax.random.key(0), checker_image)
    out = sp.apply(params, checker_image)
    assert out["keypoints"].shape == (1, 64, 2)
    assert out["descriptors"].shape == (1, 64, 256)
    d = np.asarray(out["descriptors"])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    kp = np.asarray(out["keypoints"])
    assert kp.min() >= 0 and kp.max() < 64


def test_nn_matcher_identity(rng):
    d = rng.normal(size=(1, 32, 64)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = nearest_neighbor_match(jnp.asarray(d), jnp.asarray(d))
    m = np.asarray(out["matches0"])
    np.testing.assert_array_equal(m[0], np.arange(32))


def test_nn_matcher_masks(rng):
    d0 = rng.normal(size=(1, 16, 32)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    v0 = np.ones((1, 16), bool)
    v0[0, 10:] = False
    out = nearest_neighbor_match(jnp.asarray(d0), jnp.asarray(d0),
                                 jnp.asarray(v0), jnp.asarray(v0))
    m = np.asarray(out["matches0"])
    assert (m[0, 10:] == -1).all()
    np.testing.assert_array_equal(m[0, :10], np.arange(10))


@pytest.mark.slow
def test_superglue_identity(rng):
    k = 24
    kpts = rng.uniform(10, 100, (1, k, 2)).astype(np.float32)
    desc = rng.normal(size=(1, k, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    scores = rng.uniform(0.3, 1.0, (1, k)).astype(np.float32)
    sg = SuperGlue(descriptor_dim=64, keypoint_encoder_layers=(16, 32),
                   gnn_layers=2, sinkhorn_iterations=30, match_threshold=0.0)
    data = {
        "keypoints0": jnp.asarray(kpts), "keypoints1": jnp.asarray(kpts),
        "descriptors0": jnp.asarray(desc), "descriptors1": jnp.asarray(desc),
        "scores0": jnp.asarray(scores), "scores1": jnp.asarray(scores),
        "valid0": jnp.ones((1, k), bool), "valid1": jnp.ones((1, k), bool),
        "image_hw0": (128, 128), "image_hw1": (128, 128),
    }
    params = sg.init(jax.random.key(0), data)
    out = sg.apply(params, data)
    m = np.asarray(out["matches0"])
    # Identical inputs: the diagonal should dominate (untrained net, but the
    # similarity structure is symmetric) — most keypoints match themselves.
    frac_diag = (m[0] == np.arange(k)).mean()
    assert frac_diag > 0.8, frac_diag
    # log assignment rows for valid kpts are proper distributions.
    # Sinkhorn finishes on a column update, so rows are approximately
    # normalized (same property as the original implementation).
    P = np.exp(np.asarray(out["log_assignment"]))
    np.testing.assert_allclose(P[0, :-1].sum(-1), 1.0, rtol=5e-2)


def test_superglue_padding(rng):
    k = 16
    kpts = rng.uniform(0, 60, (1, k, 2)).astype(np.float32)
    desc = rng.normal(size=(1, k, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    scores = np.ones((1, k), np.float32)
    valid = np.ones((1, k), bool)
    valid[0, 12:] = False
    sg = SuperGlue(descriptor_dim=64, keypoint_encoder_layers=(16,),
                   gnn_layers=1, sinkhorn_iterations=20, match_threshold=0.0)
    data = {
        "keypoints0": jnp.asarray(kpts), "keypoints1": jnp.asarray(kpts),
        "descriptors0": jnp.asarray(desc), "descriptors1": jnp.asarray(desc),
        "scores0": jnp.asarray(scores), "scores1": jnp.asarray(scores),
        "valid0": jnp.asarray(valid), "valid1": jnp.asarray(valid),
        "image_hw0": (64, 64), "image_hw1": (64, 64),
    }
    params = sg.init(jax.random.key(1), data)
    out = sg.apply(params, data)
    m = np.asarray(out["matches0"])
    assert (m[0, 12:] == -1).all()       # padded slots never match
    assert (m[0] < 12).all()             # nothing matches into padding


@pytest.mark.slow
def test_loftr_identity_pair(rng):
    img = rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    model = LoFTR(d_coarse=64, d_fine=32, coarse_layers=1, fine_layers=1,
                  nhead=4, max_matches=32, match_threshold=0.0)
    j = jnp.asarray(img)
    params = model.init(jax.random.key(0), j, j)
    out = model.apply(params, j, j)
    assert out["mkpts0"].shape == (1, 32, 2)
    v = np.asarray(out["valid"])
    mk0 = np.asarray(out["mkpts0"])[v]
    mk1 = np.asarray(out["mkpts1"])[v]
    assert v.sum() > 0
    # Identity pair: matches should be (nearly) the same coordinates.
    err = np.linalg.norm(mk0 - mk1, axis=-1)
    assert np.median(err) < 2.0, np.median(err)


def test_registry_surface():
    assert "superpoint_aachen" in registry.names("extractor")
    for n in ("superglue_outdoor", "superglue_indoor", "superglue_disk",
              "loftr", "NN"):
        assert n in registry.names("matcher")
    sp = registry.build("superpoint_aachen")
    assert sp.nms_radius == 3 and sp.max_keypoints == 2048
    sg = registry.build("superglue_disk")
    assert sg.descriptor_dim == 128
    with pytest.raises(KeyError):
        registry.get("nope")


def test_registry_host_side_entries(rng):
    for n in ("landmark", "contextdesc"):
        assert n in registry.names("extractor")
    assert "icp" in registry.names("matcher")

    img = (rng.uniform(0, 255, (96, 96))).astype(np.uint8)
    img[20:60, 20:60] = 255
    feats = registry.build("landmark")(img)
    assert feats["keypoints"].shape[-1] == 2

    icp = registry.build("icp", min_area=100.0)
    out = icp(img, img)
    assert out["T"].shape == (3, 3)


@pytest.mark.quick
def test_disk_brute_match(rng):
    """Dedicated DISK brute matcher: mutual + rt ratio margin
    (ref: disk_match.py:20-40)."""
    import jax.numpy as jnp

    from oetr_tpu.models.matchers import disk_brute_match

    d = rng.normal(0, 1, (1, 20, 32))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    perm = rng.permutation(20)
    d1 = d[:, perm] + rng.normal(0, 0.01, (1, 20, 32))
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    out = disk_brute_match(jnp.asarray(d), jnp.asarray(d1), rt=0.1)
    m = np.asarray(out["matches0"][0])
    kept = m > -1
    assert kept.sum() >= 18                      # near-perfect recovery
    # d1[:, j] == d[:, perm[j]] -> expected matches0[i] = inv[i].
    inv = np.empty_like(perm)
    inv[perm] = np.arange(20)
    assert (m[kept] == inv[np.nonzero(kept)[0]]).all()
    assert set(np.asarray(out["matching_scores0"][0])[kept]) == {1.0}


@pytest.mark.quick
def test_sinkhorn_bf16_inputs_no_drift(rng):
    """bf16 GNN scores through the OT solver match the f32 oracle: the
    iterations are pinned to f32 internally (mixed-precision policy)."""
    import jax.numpy as jnp

    from oetr_tpu.ops.sinkhorn import log_optimal_transport

    scores = rng.normal(0, 1, (2, 40, 48)).astype(np.float32)
    ref = log_optimal_transport(jnp.asarray(scores), 0.7, 30)
    out = log_optimal_transport(jnp.asarray(scores, jnp.bfloat16), 0.7, 30)
    assert out.dtype == jnp.float32
    # bf16 quantizes the INPUT scores (~1e-2 relative); the iterations
    # themselves add no further drift.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)
