"""DISK / D2-Net / R2D2 / ASLFeat extractors, SIFT-based host extractors,
ICP contour matcher."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.models import (ASLFeat, D2Net, DISK, R2D2,
                             ContextDescAugmenter, contextdesc_extract,
                             icp_match, landmark_extract, registry)


def _check_extractor_output(out, k, d, hw):
    assert out["keypoints"].shape == (1, k, 2)
    assert out["descriptors"].shape == (1, k, d)
    kp = np.asarray(out["keypoints"])
    assert kp.min() >= 0 and kp[..., 0].max() < hw[1] and \
        kp[..., 1].max() < hw[0]
    desc = np.asarray(out["descriptors"])
    np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_disk(rng):
    model = DISK(max_keypoints=64)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)
    out = model.apply(params, img)
    _check_extractor_output(out, 64, 128, (64, 64))


@pytest.mark.slow
def test_d2net(rng):
    model = D2Net(max_keypoints=32)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)
    out = model.apply(params, img)
    _check_extractor_output(out, 32, 512, (64, 64))
    # Detection scores are a normalized distribution per image.
    s = np.asarray(out["dense_scores"])
    assert s.min() >= 0


def test_r2d2(rng):
    model = R2D2(max_keypoints=64, reliability_thr=0.0, repeatability_thr=0.0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)
    out = model.apply(params, img)
    _check_extractor_output(out, 64, 128, (48, 48))
    assert out["reliability"].shape == (1, 48, 48)


def test_aslfeat(rng):
    model = ASLFeat(max_keypoints=32)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
    params = model.init(jax.random.key(0), img)
    out = model.apply(params, img)
    _check_extractor_output(out, 32, 128, (64, 64))


def test_registry_has_all_extractors():
    names = registry.names("extractor")
    for n in ("superpoint_aachen", "superpoint_inloc", "d2net-ss",
              "r2d2-desc", "disk-desc", "aslfeat-desc"):
        assert n in names, n
    assert "disk" in registry.names("matcher")


@pytest.fixture
def textured_u8(rng):
    img = (rng.uniform(0, 255, (16, 16))).astype(np.uint8)
    return cv2.resize(img, (128, 128), interpolation=cv2.INTER_NEAREST)


def test_landmark_sift(textured_u8):
    out = landmark_extract(textured_u8, topk=64)
    assert out["keypoints"].shape == (64, 2)
    assert out["valid"].any()


def test_contextdesc(textured_u8):
    aug = ContextDescAugmenter()
    params = aug.init(jax.random.key(0), jnp.zeros((1, 4, 128)),
                      jnp.zeros((1, 4, 2)), jnp.zeros((1, 4)))
    out = contextdesc_extract(textured_u8, aug, params, topk=64)
    assert out["descriptors"].shape == (64, 128)
    v = out["valid"]
    if v.any():
        np.testing.assert_allclose(
            np.linalg.norm(out["descriptors"][v], axis=-1), 1.0, atol=1e-4)


def test_icp_match(rng):
    # A white blob translated by (15, 8) between two frames.
    img0 = np.zeros((240, 240), np.uint8)
    cv2.circle(img0, (100, 100), 60, 255, -1)
    M = np.float32([[1, 0, 15], [0, 1, 8]])
    img1 = cv2.warpAffine(img0, M, (240, 240))
    out = icp_match(img0, img1, min_area=1000.0)
    assert out["converged"]
    T = out["T"]
    np.testing.assert_allclose(T[0, 2], 15.0, atol=3.0)
    np.testing.assert_allclose(T[1, 2], 8.0, atol=3.0)
    np.testing.assert_allclose(T[0, 0], 1.0, atol=0.05)


@pytest.mark.quick
def test_contextdesc_full_network(rng):
    """Full ContextDesc (regional visual tower + geometric context +
    fusion + matchability) — paper architecture, replacing the round-1
    MLP stand-in."""
    import jax
    import jax.numpy as jnp

    from oetr_tpu.models.sift_based import ContextDesc

    net = ContextDesc(regional_dim=16, hidden=32)
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    desc = jnp.asarray(rng.normal(0, 0.1, (1, 20, 128)), jnp.float32)
    xy = jnp.asarray(rng.uniform(0, 64, (1, 20, 2)), jnp.float32)
    scores = jnp.asarray(rng.uniform(0, 1, (1, 20)), jnp.float32)
    valid = jnp.asarray(np.arange(20) < 15)[None]

    params = net.init(jax.random.key(0), img, desc, xy, scores, valid)
    out, match = net.apply(params, img, desc, xy, scores, valid)
    assert out.shape == (1, 20, 128) and match.shape == (1, 20)
    norms = np.linalg.norm(np.asarray(out)[0], axis=-1)
    np.testing.assert_allclose(norms[:15], 1.0, atol=1e-5)   # unit desc
    np.testing.assert_allclose(norms[15:], 0.0, atol=1e-6)   # masked
    assert (np.asarray(match)[0, 15:] == 0).all()
    assert ((np.asarray(match)[0, :15] > 0) &
            (np.asarray(match)[0, :15] < 1)).all()


def test_contextdesc_trains(rng):
    """ContextDesc trains from scratch: the correspondence InfoNCE falls
    and the matchability head separates matched from unmatched
    keypoints on held-out homography pairs."""
    import jax
    import jax.numpy as jnp
    import optax

    from oetr_tpu.models.sift_based import ContextDesc
    from oetr_tpu.training.contextdesc import (contextdesc_pairs_batch,
                                               make_contextdesc_train_step)

    hw, k = 96, 64
    net = ContextDesc(regional_dim=16, hidden=64)
    b0 = contextdesc_pairs_batch(rng, 2, hw, k)
    jb = {key: jnp.asarray(v) for key, v in b0.items()}
    params = net.init(jax.random.key(0), jb["image0"], jb["desc0"],
                      jb["xy0"], jb["scores0"], jb["valid0"])
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_contextdesc_train_step(net, tx, w_match=1.0)

    first = last = None
    for it in range(150):
        batch = contextdesc_pairs_batch(rng, 2, hw, k)
        batch = {key: jnp.asarray(v) for key, v in batch.items()}
        params, opt, m = step(params, opt, batch)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < 0.7 * first, (first, last)

    # Held-out: matchability mean for GT-matched kpts > unmatched kpts.
    batch = contextdesc_pairs_batch(rng, 4, hw, k)
    jb = {key: jnp.asarray(v) for key, v in batch.items()}
    _, match = net.apply(params, jb["image0"], jb["desc0"], jb["xy0"],
                         jb["scores0"], jb["valid0"])
    match = np.asarray(match)
    has = batch["gt_matches0"] >= 0
    v = batch["valid0"]
    pos = match[has & v].mean()
    neg = match[~has & v].mean()
    # Separation emerges slowly at CPU scale (measured +0.015-0.03 by
    # 100-200 steps); assert the direction, TPU-scale runs sharpen it.
    assert pos > neg + 0.005, (pos, neg)
