"""SuperGlue trains: OT-NLL loss decreases and match accuracy beats the
untrained net on synthetic correspondence problems.

Data: shared random unit descriptors with noise (matchable), a tail of
unmatched keypoints on both sides, GT assignment known by construction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oetr_tpu.models import SuperGlue
from oetr_tpu.training.superglue import (make_superglue_train_step,
                                         superglue_nll_loss)


def _problem(rng, b=4, k=24, n_match=16, d=32, noise=0.15):
    """Batch of synthetic matching problems with GT."""
    desc0 = rng.normal(0, 1, (b, k, d)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=-1, keepdims=True)
    perm = np.stack([rng.permutation(k) for _ in range(b)])
    desc1 = np.take_along_axis(desc0, perm[..., None], axis=1)
    desc1 = desc1 + rng.normal(0, noise, desc1.shape).astype(np.float32)
    # Unmatchable tails: replace descriptors past n_match on both sides.
    gt = np.empty((b, k), np.int64)
    inv = np.empty_like(perm)
    for i in range(b):
        inv[i, perm[i]] = np.arange(k)
    gt = inv.copy()
    for i in range(b):
        unmatched0 = perm[i][n_match:]       # these image-0 kpts lost
        desc1[i, n_match:] = rng.normal(0, 1, (k - n_match, d))
        gt[i, unmatched0] = -1
    desc1 /= np.linalg.norm(desc1, axis=-1, keepdims=True)
    kpts = rng.uniform(0, 100, (b, k, 2)).astype(np.float32)
    batch = {
        "keypoints0": jnp.asarray(kpts),
        "keypoints1": jnp.asarray(rng.uniform(0, 100, (b, k, 2)),
                                  jnp.float32),
        "descriptors0": jnp.asarray(desc0),
        "descriptors1": jnp.asarray(desc1),
        "scores0": jnp.ones((b, k), jnp.float32),
        "scores1": jnp.ones((b, k), jnp.float32),
        "valid0": jnp.ones((b, k), bool),
        "valid1": jnp.ones((b, k), bool),
        "image_hw0": (128, 128), "image_hw1": (128, 128),
        "gt_matches0": jnp.asarray(gt),
    }
    return batch


@pytest.mark.slow
def test_superglue_trains(rng):
    sg = SuperGlue(descriptor_dim=32, keypoint_encoder_layers=(16, 32),
                   gnn_layers=2, sinkhorn_iterations=20,
                   match_threshold=0.2)
    batch = _problem(rng)
    params = sg.init(jax.random.key(0), batch)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_superglue_train_step(sg, tx)

    losses, accs = [], []
    for i in range(60):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
        accs.append(float(m["match_acc"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert accs[-1] > accs[0] + 0.2, (accs[0], accs[-1])
    assert accs[-1] > 0.5


def test_nll_loss_prefers_correct_assignment(rng):
    """Oracle check: the loss is lower for a plan concentrated on the GT
    assignment than for a uniform one."""
    b, m, n = 1, 4, 4
    gt = jnp.asarray([[1, 0, 3, -1]])
    valid = jnp.ones((b, m), bool)

    good = jnp.full((b, m + 1, n + 1), -9.0)
    for i, j in enumerate([1, 0, 3]):
        good = good.at[0, i, j].set(-0.05)
    good = good.at[0, 3, n].set(-0.05)     # unmatched -> dustbin col
    good = good.at[0, m, 2].set(-0.05)     # kpt1 #2 unmatched -> dustbin row

    uniform = jnp.full((b, m + 1, n + 1), -np.log((m + 1) * (n + 1)))
    l_good = superglue_nll_loss(good, gt, valid, valid)
    l_uni = superglue_nll_loss(uniform, gt, valid, valid)
    assert float(l_good) < float(l_uni)
