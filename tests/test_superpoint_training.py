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
