"""On-device synthetic pair generator + round-4 anti-hedging losses."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def gen_batch():
    import jax

    from oetr_tpu.data.device_synth import make_device_generator

    gen = make_device_generator(128, 4, scale_range=(1.5, 2.5),
                                p_translate=0.25, max_shift_px=24)
    return jax.tree.map(np.asarray, gen(jax.random.key(3)))


@pytest.mark.quick
def test_device_batch_shapes_and_keys(gen_batch):
    b = gen_batch
    assert b["image1"].shape == (4, 128, 128, 3)
    assert b["image2"].shape == (4, 128, 128, 3)
    assert b["image1"].min() >= 0.0 and b["image1"].max() <= 1.0
    for k in ("overlap_box1", "overlap_box2", "overlap_valid", "K1", "K2",
              "depth1", "depth2", "pose1", "pose2", "crop1", "crop2",
              "ratio1", "ratio2", "scale"):
        assert k in b, k
    assert bool(b["overlap_valid"].all())


def test_device_boxes_match_analytic_dolly(gen_batch):
    """For dolly pairs the GT box1 extent must equal hw/s (the magnified
    sub-crop), since the geometry path recomputes what the renderer did."""
    b = gen_batch
    hw = 128
    for i in range(4):
        s = float(b["scale"][i])
        if s <= 1.01:
            continue
        w = b["overlap_box1"][i][2] - b["overlap_box1"][i][0]
        assert abs(w - hw / s) < 3.0, (s, w)
        # image2 covers (nearly) the full frame
        w2 = b["overlap_box2"][i][2] - b["overlap_box2"][i][0]
        assert w2 > hw - 6


def test_device_render_consistency(gen_batch):
    """image2 must be (approximately) the magnified GT-box crop of image1."""
    import cv2

    b = gen_batch
    i = int(np.argmax(b["scale"]))
    if float(b["scale"][i]) <= 1.05:
        pytest.skip("no dolly pair in this batch")
    box = b["overlap_box1"][i]
    crop = b["image1"][i][int(box[1]):int(box[3]), int(box[0]):int(box[2])]
    up = cv2.resize(crop, (128, 128))
    err = float(np.abs(up - b["image2"][i]).mean())
    assert err < 0.06, err


def test_device_batches_differ():
    """Different rng keys must give different pairs (infinite stream, not
    a fixed dataset)."""
    import jax

    from oetr_tpu.data.device_synth import make_device_generator

    gen = make_device_generator(64, 2, max_shift_px=12)
    a = np.asarray(gen(jax.random.key(0))["image1"])
    b = np.asarray(gen(jax.random.key(1))["image1"])
    assert np.abs(a - b).mean() > 0.05


@pytest.mark.quick
def test_boxes_from_prob_map_recovers_box():
    """A heatmap uniform inside a box region decodes back to that box."""
    import jax.numpy as jnp

    from oetr_tpu.geometry.boxes import boxes_from_prob_map

    hf = wf = 8
    hw = 256.0
    p = np.zeros((hf, wf), np.float32)
    p[2:5, 1:4] = 1.0              # tokens rows 2..4, cols 1..3
    p /= p.sum()
    box = np.asarray(boxes_from_prob_map(jnp.asarray(p.reshape(1, -1)),
                                         hf, wf, (hw, hw), q=0.02))[0]
    # token 1..3 in x -> pixels [32, 128); token 2..4 in y -> [64, 160)
    assert np.allclose(box, [32.0, 64.0, 128.0, 160.0], atol=1e-4), box


@pytest.mark.quick
def test_size_loss_zero_at_perfect_prediction():
    import jax.numpy as jnp

    from oetr_tpu.training.losses import size_loss

    gt = jnp.asarray([[32.0, 32.0, 96.0, 96.0]])
    center = jnp.asarray([[64.0, 64.0]])
    hw = (128, 128)
    tlbr_perfect = jnp.asarray([[0.25, 0.25, 0.25, 0.25]])  # (t,l,b,r)/128
    out = {"center1": center, "tlbr1": tlbr_perfect,
           "center2": center, "tlbr2": tlbr_perfect}
    v = jnp.asarray([True])
    loss0 = float(size_loss(out, gt, gt, v, hw, hw))
    assert loss0 < 1e-6
    # hedged full-frame tlbr must be penalized
    out_h = dict(out, tlbr1=jnp.ones((1, 4)), tlbr2=jnp.ones((1, 4)))
    assert float(size_loss(out_h, gt, gt, v, hw, hw)) > 0.5


@pytest.mark.quick
def test_difficulty_weights_emphasize_scale_pairs():
    import jax.numpy as jnp

    from oetr_tpu.training.losses import difficulty_weights

    hw = (128, 128)
    full = [0.0, 0.0, 128.0, 128.0]
    small = [0.0, 0.0, 64.0, 64.0]     # 2x scale pair
    gt1 = jnp.asarray([full, small])
    gt2 = jnp.asarray([full, full])
    w = np.asarray(difficulty_weights(gt1, gt2, hw, hw))
    assert w[1] > w[0]                  # hard pair upweighted
    assert abs(w.mean() - 1.0) < 1e-5   # normalized


def test_heatmap_ce_tiny_box_fallback():
    """A GT box containing no token center must still produce a nonzero
    one-hot target (advisor round-3 finding), not silently zero loss."""
    import jax.numpy as jnp

    from oetr_tpu.training.losses import heatmap_ce_loss

    hw = (128, 128)                    # 4x4 tokens at stride 32
    prob = jnp.full((1, 16), 1.0 / 16.0)
    # box of 2px near (48, 48) = between token centers (16/48/80/112 grid):
    # actually 48 IS a center; use (30..34) which contains no center
    box = jnp.asarray([[30.0, 30.0, 34.0, 34.0]])
    v = jnp.asarray([True])
    loss = float(heatmap_ce_loss(prob, box, v, hw))
    assert loss > 1.0                  # -log(1/16) = 2.77 for uniform


def test_token_matches_occlusion_check():
    """A foreground plane in image2 must invalidate matches of background
    tokens it hides (advisor round-3 finding)."""
    import jax.numpy as jnp

    from oetr_tpu.training.losses import token_matches_from_geometry

    hw, stride, f, z = 128, 32, 120.0, 10.0
    K = jnp.asarray([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1.0]])
    depth1 = jnp.full((hw, hw), z)
    T1 = jnp.eye(4)
    T2 = jnp.eye(4)                    # identical cameras
    crop = jnp.zeros(2)
    ratio = jnp.ones(2)
    # Without depth2: every token matches itself.
    gt, ok = token_matches_from_geometry(K, depth1, T1, crop, ratio,
                                         K, T2, crop, ratio, (hw, hw),
                                         stride)
    assert bool(np.asarray(ok).all())
    # depth2 has a near foreground slab over the left half -> those
    # background matches are occluded.
    depth2 = np.full((hw, hw), z, np.float32)
    depth2[:, :64] = 3.0
    gt2, ok2 = token_matches_from_geometry(K, depth1, T1, crop, ratio,
                                           K, T2, crop, ratio, (hw, hw),
                                           stride, depth2=jnp.asarray(depth2))
    ok2 = np.asarray(ok2).reshape(4, 4)
    assert not ok2[:, :2].any()        # occluded half invalid
    assert ok2[:, 2:].all()            # visible half still matched


@pytest.mark.quick
def test_homography_generator_warp_parity():
    """On-device homography render must match cv2.warpPerspective."""
    import cv2
    import jax

    from oetr_tpu.data.device_synth import make_homography_pair_generator

    gen = make_homography_pair_generator(64, 2)
    im0, im1, H = gen(jax.random.key(0))
    g = np.asarray(im0[0, :, :, 0])
    ref = cv2.warpPerspective(g, np.asarray(H[0]), (64, 64),
                              flags=cv2.INTER_LINEAR,
                              borderMode=cv2.BORDER_CONSTANT,
                              borderValue=0.0)
    assert np.abs(ref - np.asarray(im1[0, :, :, 0])).mean() < 0.02


@pytest.mark.quick
def test_gt_matches_batch_identity_and_occlusion():
    import jax.numpy as jnp

    from oetr_tpu.training.superglue import gt_matches_batch

    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])[None]
    xy = jnp.asarray(np.random.RandomState(0).uniform(
        5, 59, (1, 16, 2)).astype(np.float32))
    v = jnp.ones((1, 16), bool)
    depth = jnp.full((1, 64, 64), 5.0)
    T = jnp.eye(4)[None]
    gt = gt_matches_batch(xy, v, xy, v, depth, K, T, K)
    assert (np.asarray(gt[0]) == np.arange(16)).all()
    # occluding depth2 (all-near slab) kills every match
    d2 = jnp.full((1, 64, 64), 1.0)
    gt2 = gt_matches_batch(xy, v, xy, v, depth, K, T, K, depth1=d2)
    assert (np.asarray(gt2[0]) == -1).all()


@pytest.mark.quick
def test_decode_boxes_heatmap_source():
    """heatmap decode: concentrated prob mass -> padded sub-frame box;
    tlbr source returns pred_bbox verbatim."""
    import jax.numpy as jnp

    from oetr_tpu.models.oetr import decode_boxes

    n = 64                      # 8x8 grid at 256^2
    p = np.zeros((1, 8, 8), np.float32)
    p[0, 2:5, 2:5] = 1.0        # mass in rows/cols 2..4
    p = (p / p.sum()).reshape(1, n)
    out = {"prob_map1": jnp.asarray(p), "prob_map2": jnp.asarray(p),
           "pred_bbox1": jnp.asarray([[1.0, 2, 3, 4]]),
           "pred_bbox2": jnp.asarray([[5.0, 6, 7, 8]])}
    b1, b2 = decode_boxes(out, (256, 256), (256, 256), source="tlbr")
    assert np.allclose(np.asarray(b1), [[1, 2, 3, 4]])
    h1, h2 = decode_boxes(out, (256, 256), (256, 256), source="heatmap",
                          q=0.02, pad=0.0)
    # tokens 2..4 -> pixels [64, 160)
    assert np.allclose(np.asarray(h1)[0], [64, 64, 160, 160], atol=1e-4)
    hp, _ = decode_boxes(out, (256, 256), (256, 256), source="heatmap",
                         q=0.02, pad=0.25)
    assert np.allclose(np.asarray(hp)[0], [40, 40, 184, 184], atol=1e-4)
