"""MagicPoint-stage SuperPoint training: the detector learns synthetic
corners (loss drops; detected keypoints land near GT corners far more
often than at init)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oetr_tpu.models.superpoint import SuperPointNet, simple_nms
from oetr_tpu.training.superpoint import (corners_to_cell_labels,
                                          magicpoint_loss,
                                          make_superpoint_train_step,
                                          synthetic_shapes_batch)


def test_cell_labels_roundtrip():
    corners = np.array([[[13.0, 5.0], [70.0, 90.0], [-1.0, -1.0]]])
    labels = corners_to_cell_labels(corners, (96, 96), np.array([2]))
    assert labels.shape == (1, 12, 12)
    assert labels[0, 0, 1] == (5 % 8) * 8 + (13 % 8)
    assert labels[0, 90 // 8, 70 // 8] == (90 % 8) * 8 + (70 % 8)
    assert (labels == 64).sum() == 12 * 12 - 2


def test_magicpoint_loss_prefers_gt():
    labels = np.full((1, 2, 2), 64, np.int32)
    labels[0, 0, 0] = 10
    good = np.zeros((1, 2, 2, 65), np.float32)
    good[..., 64] = 5.0
    good[0, 0, 0] = 0.0
    good[0, 0, 0, 10] = 5.0
    uniform = np.zeros((1, 2, 2, 65), np.float32)
    assert float(magicpoint_loss(jnp.asarray(good), jnp.asarray(labels))) < \
        float(magicpoint_loss(jnp.asarray(uniform), jnp.asarray(labels)))


def _corner_hit_rate(params, net, images, corners, counts, radius=4.0):
    """Fraction of GT corners with a top-scoring detection nearby."""
    scores, _ = net.apply(params, jnp.asarray(images))
    nmsed = np.asarray(simple_nms(scores, 4))
    hits = total = 0
    for i in range(len(images)):
        s = nmsed[i]
        ys, xs = np.unravel_index(np.argsort(s.ravel())[::-1][:40], s.shape)
        det = np.stack([xs, ys], -1).astype(np.float32)
        for c in corners[i][:counts[i]]:
            d = np.linalg.norm(det - c[None], axis=-1).min()
            hits += d <= radius
            total += 1
    return hits / max(total, 1)


@pytest.mark.slow
def test_superpoint_detector_trains(rng):
    net = SuperPointNet(descriptor_dim=64)
    images, corners, counts = synthetic_shapes_batch(rng, b=8, hw=96)
    labels = jnp.asarray(corners_to_cell_labels(corners, (96, 96), counts))
    params = net.init(jax.random.key(0), jnp.asarray(images))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_superpoint_train_step(net, tx)

    hit0 = _corner_hit_rate(params, net, images, corners, counts)
    losses = []
    for _ in range(80):
        params, opt_state, m = step(params, opt_state, jnp.asarray(images),
                                    labels)
        losses.append(float(m["loss"]))
    hit1 = _corner_hit_rate(params, net, images, corners, counts)
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])
    assert hit1 > hit0 + 0.2, (hit0, hit1)
    assert hit1 > 0.6, hit1


def test_superpoint_descriptor_trains(rng):
    """Joint detector+descriptor training: the hinge loss falls and
    held-out homography-pair cell correspondences become mutual-NN
    retrievable by descriptor similarity."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from oetr_tpu.models.superpoint import SuperPointNet
    from oetr_tpu.training.superpoint import (
        cell_centers, corners_to_cell_labels, descriptor_hinge_loss,
        homography_pairs_batch, make_superpoint_joint_train_step,
        synthetic_shapes_batch)

    hw = 64
    net = SuperPointNet(descriptor_dim=64)
    params = net.init(jax.random.key(0), jnp.zeros((1, hw, hw, 1)))
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_superpoint_joint_train_step(net, tx, lambda_desc=1.0)

    first_desc = last_desc = None
    for it in range(50):
        imgs, corners, counts = synthetic_shapes_batch(rng, 4, hw)
        labels = jnp.asarray(corners_to_cell_labels(corners, (hw, hw),
                                                    counts))
        im0, im1, H = homography_pairs_batch(rng, 4, hw)
        params, opt_state, m = step(params, opt_state, jnp.asarray(imgs),
                                    labels, jnp.asarray(im0),
                                    jnp.asarray(im1), jnp.asarray(H))
        if first_desc is None:
            first_desc = float(m["desc_loss"])
        last_desc = float(m["desc_loss"])
    assert last_desc < 0.6 * first_desc, (first_desc, last_desc)

    # Held-out pair: cells whose warped center stays inside should find
    # their counterpart as descriptor nearest neighbour far above chance.
    im0, im1, H = homography_pairs_batch(rng, 2, hw)
    _, d0 = net.apply(params, jnp.asarray(im0))
    _, d1 = net.apply(params, jnp.asarray(im1))
    b, hc, wc, dd = d0.shape
    n = hc * wc
    centers = cell_centers(hc, wc)
    pts = jnp.concatenate([centers, jnp.ones((n, 1))], axis=-1)
    warped = jnp.einsum("bij,nj->bni", jnp.asarray(H), pts)
    warped = warped[..., :2] / warped[..., 2:]
    hits = total = 0
    for i in range(b):
        dist = np.linalg.norm(np.asarray(warped)[i][:, None]
                              - np.asarray(centers)[None], axis=-1)
        gt = dist.argmin(1)
        visible = dist.min(1) < 4.0
        sim = np.asarray(jnp.einsum(
            "nd,md->nm", d0[i].reshape(n, dd), d1[i].reshape(n, dd)))
        pred = sim.argmax(1)
        hits += int(((pred == gt) & visible).sum())
        total += int(visible.sum())
    assert total > 10
    acc = hits / total
    # 50 CPU steps only reaches the early phase (the hinge first passes
    # through an all-descriptors-similar plateau, ~0.77 loss, before
    # differentiating — measured trajectory: acc 0.09-0.14 @50 steps,
    # 0.16-0.26 @200-300); assert well above the 1/n chance floor. The
    # TPU-scale run (scripts/train_matching_demo.py) does the real work.
    assert acc > 4.0 / n, f"cell retrieval {acc} (chance {1/n:.3f})"
    assert acc > 0.05, f"cell retrieval accuracy {acc}"


def test_ha_labeler_density_and_determinism(rng):
    """Homographic-adaptation labels (round 4): per-image top-K keeps a
    usable label density on texture images (the fixed-threshold variant
    starved to <10/256 cells), labels are deterministic, and the 65-way
    encoding stays in range."""
    import jax

    from oetr_tpu.data.device_synth import make_homography_pair_generator
    from oetr_tpu.models.superpoint import SuperPointNet
    from oetr_tpu.training.superpoint import make_ha_labeler

    net = SuperPointNet(descriptor_dim=32)
    params = net.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    gen = make_homography_pair_generator(64, 2)
    im0, _, _ = gen(jax.random.key(3))
    labeler = make_ha_labeler(net, 64, n_homo=3, max_cells=24)
    lab1 = np.asarray(labeler(params, im0, jax.random.key(9)))
    lab2 = np.asarray(labeler(params, im0, jax.random.key(9)))
    assert lab1.shape == (2, 8, 8)
    np.testing.assert_array_equal(lab1, lab2)
    assert lab1.min() >= 0 and lab1.max() <= 64
    n_labeled = (lab1 != 64).reshape(2, -1).sum(1)
    assert (n_labeled >= 5).all(), n_labeled      # density floor
    assert (n_labeled <= 24).all(), n_labeled     # top-K cap


def test_corner_labeler_density_determinism_and_cv2_agreement():
    """Round-5 Shi-Tomasi corner teacher (make_corner_labeler): label
    budget respected, deterministic, 65-way encoding valid, and labels
    land on cv2.goodFeaturesToTrack corners (the semantics it mirrors).
    """
    import cv2

    from oetr_tpu.data.device_synth import make_homography_pair_generator
    from oetr_tpu.training.superpoint import make_corner_labeler

    hw = 128
    lab = make_corner_labeler(hw, max_cells=64)
    gen = make_homography_pair_generator(hw, 4, scale_range=(0.7, 1.4))
    im0, _, _ = gen(jax.random.key(3))
    L1 = np.asarray(lab(jnp.asarray(im0)))
    L2 = np.asarray(lab(jnp.asarray(im0)))
    np.testing.assert_array_equal(L1, L2)
    assert L1.shape == (4, hw // 8, hw // 8)
    assert L1.min() >= 0 and L1.max() <= 64
    dens = (L1 != 64).reshape(4, -1).sum(1)
    assert (dens > 16).all() and (dens <= 64).all(), dens

    img = np.asarray(im0[0, :, :, 0])
    pts = cv2.goodFeaturesToTrack((img * 255).astype(np.uint8), 64,
                                  0.01, 4)
    assert pts is not None
    pts = pts[:, 0, :]
    ys, xs = np.nonzero(L1[0] != 64)
    sub = L1[0][ys, xs]
    py = ys * 8 + sub // 8
    px = xs * 8 + sub % 8
    d = np.linalg.norm(np.stack([px, py], -1)[:, None] - pts[None],
                       axis=-1).min(1)
    # The majority of teacher labels must sit on a cv2 corner.
    assert (d < 3.0).mean() > 0.5, (d < 3.0).mean()
