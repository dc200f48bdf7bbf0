"""Auxiliary coarse-correspondence supervision (token InfoNCE)."""
import numpy as np
import pytest


@pytest.mark.quick
def test_token_matches_translation():
    """Constant-depth pure translation: token matches are the exact
    token-grid shift."""
    import jax.numpy as jnp

    from oetr_tpu.training.losses import token_matches_from_geometry

    hw, stride, f, z = 128, 32, 120.0, 10.0
    K = jnp.asarray([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1.0]])
    depth = jnp.full((hw, hw), z)
    T1 = jnp.eye(4)
    # Camera 2 at +x world: content shifts by -dx px; pixel u1 maps to
    # u2 = u1 - dx with dx = f * tx / z.
    dx_px = 64.0                       # exactly 2 tokens
    T2 = jnp.eye(4).at[0, 3].set(-dx_px * z / f)
    zero = jnp.zeros(2)
    one = jnp.ones(2)
    gt, ok = token_matches_from_geometry(K, depth, T1, zero, one, K, T2,
                                         zero, one, (hw, hw), stride)
    n = hw // stride
    gt = np.asarray(gt).reshape(n, n)
    ok = np.asarray(ok).reshape(n, n)
    for r in range(n):
        for c in range(n):
            if c - 2 >= 0:
                assert ok[r, c]
                assert gt[r, c] == r * n + (c - 2), (r, c, gt[r, c])
            else:
                assert not ok[r, c]


@pytest.mark.quick
def test_token_infonce_gradient_aligns():
    """InfoNCE is minimized when matched tokens agree; gradient descent
    on random features recovers the correspondence."""
    import jax
    import jax.numpy as jnp

    from oetr_tpu.training.losses import token_infonce_loss

    rng = np.random.default_rng(0)
    b, n, d = 2, 16, 8
    gt = jnp.asarray(np.tile(np.arange(n), (b, 1)))     # identity match
    valid = jnp.ones((b, n), bool)
    m1 = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)

    loss = lambda a, c: token_infonce_loss(a, c, gt, valid)
    l0 = float(loss(m1, m2))
    g = jax.grad(loss, argnums=(0, 1))
    for _ in range(60):
        g1, g2 = g(m1, m2)
        m1 = m1 - 0.5 * g1
        m2 = m2 - 0.5 * g2
    l1 = float(loss(m1, m2))
    assert l1 < 0.3 * l0, (l0, l1)
    # Retrieval: each token's argmax similarity is its GT counterpart.
    n1 = m1 / jnp.linalg.norm(m1, axis=-1, keepdims=True)
    n2 = m2 / jnp.linalg.norm(m2, axis=-1, keepdims=True)
    sim = np.asarray(jnp.einsum("bnd,bmd->bnm", n1, n2))
    assert (sim.argmax(-1) == np.asarray(gt)).mean() > 0.9


def test_aux_match_loss_in_train_step(tmp_path):
    """make_train_step(aux_match_weight>0) consumes geometry batches and
    the aux loss decreases over a few steps on a synthetic scene."""
    import jax
    import jax.numpy as jnp

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene
    from oetr_tpu.training import create_train_state, make_train_step

    hw = 96
    pairs = generate_scene(str(tmp_path), n_pairs=4, image_hw=hw,
                           max_shift_px=24, seed=1,
                           scale_range=(1.3, 2.0))
    ds = MegaDepthPairsDataset(str(tmp_path), pairs, image_size=(hw, hw),
                               train=True)
    cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3",
                                last_layer=256),
        neck=NeckConfig(d_model=32, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(3, 3)))
    tc = TrainConfig(batch_size=4, image_size=(hw, hw), lr=1e-3,
                     lr_milestones=(10 ** 6,))
    model, state, tx = create_train_state(cfg, tc, jax.random.key(0),
                                          (hw, hw))
    step = make_train_step(model, tx, cycle=False, aux_match_weight=1.0)
    batch = next(ds.batches(4, geometry=True))
    losses = []
    rng = jax.random.key(1)
    for i in range(8):
        rng, drop = jax.random.split(rng)
        state, metrics = step(state, batch, drop)
        losses.append(float(metrics["aux_match_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.quick
def test_heatmap_ce_loss():
    """Mass inside the GT box minimizes the loss; uniform mass is
    penalized by the log-ratio of box to image area."""
    import jax.numpy as jnp

    from oetr_tpu.training.losses import heatmap_ce_loss

    b, hf = 2, 8
    hw = (256, 256)
    n = hf * hf
    box = jnp.asarray(np.tile([64.0, 64.0, 192.0, 192.0], (b, 1)))
    valid = jnp.ones((b,), bool)

    # Ideal: uniform over the 4x4 token block inside the box.
    stride = 256 / hf
    ideal = np.zeros((b, hf, hf), np.float32)
    for r in range(hf):
        for c in range(hf):
            cxy = ((c + 0.5) * stride, (r + 0.5) * stride)
            if 64 <= cxy[0] <= 192 and 64 <= cxy[1] <= 192:
                ideal[:, r, c] = 1.0
    ideal /= ideal.sum(axis=(1, 2), keepdims=True)
    l_ideal = float(heatmap_ce_loss(jnp.asarray(ideal.reshape(b, n)), box,
                                    valid, hw))
    uniform = jnp.full((b, n), 1.0 / n)
    l_uniform = float(heatmap_ce_loss(uniform, box, valid, hw))
    assert l_ideal < l_uniform - 0.5
    np.testing.assert_allclose(l_ideal, np.log(16), rtol=1e-5)
    np.testing.assert_allclose(l_uniform, np.log(64), rtol=1e-5)
