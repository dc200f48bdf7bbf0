"""Depth-warped CycleOverlapLoss (ref: src/losses/losses.py:246-520).

Synthetic fronto-parallel scene: constant depth plane, identity rotation,
pure x translation — the warp of any box is a closed-form pixel shift
(shift = fx * tx / z), so the warped box and the GIoU value are exact
oracles. Coordinates use non-integer shifts to avoid int-truncation
boundary flips (see .claude/skills/verify gotchas).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.training import (cycle_overlap_loss, interpolate_depth,
                               warped_box_via_depth)

H = W = 64
FX = FY = 100.0
CX = CY = 32.0
Z = 5.0
TX = 0.3  # shift = FX * TX / Z = 6.0 px... use 0.317 -> 6.34 px
TX = 0.317
SHIFT = FX * TX / Z  # 6.34 px


def scene():
    K = jnp.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
    depth = jnp.full((H, W), Z)
    T1 = jnp.eye(4)
    T2 = jnp.eye(4).at[0, 3].set(-TX)  # camera2 shifted +x in world
    crop = jnp.zeros((2,))
    ratio = jnp.ones((2,))
    return K, depth, T1, T2, crop, ratio


def test_interpolate_depth_bilinear():
    depth = jnp.arange(16.0).reshape(4, 4) + 1.0
    uv = jnp.array([[1.5, 2.5], [0.0, 0.0], [3.0, 3.0], [-1.0, 0.0]])
    z, valid = interpolate_depth(depth, uv)
    # (x=1.5, y=2.5): mean of depth[2:4,1:3] = mean(10,11,14,15) = 12.5
    np.testing.assert_allclose(np.asarray(z[:3]), [12.5, 1.0, 16.0])
    assert bool(valid[0]) and bool(valid[1]) and bool(valid[2])
    assert not bool(valid[3])  # out of bounds


def test_warped_box_pure_translation():
    K, depth, T1, T2, crop, ratio = scene()
    box1 = jnp.array([10.0, 12.0, 40.0, 50.0])
    wbox, ok = warped_box_via_depth(box1, K, depth, T1, crop, ratio,
                                    K, depth, T2, crop, ratio)
    assert bool(ok)
    # Pixels inside box1 map to x - SHIFT in image2 (integer pixel
    # centers inside [10, 40] -> [10 - 6.34, 40 - 6.34]).
    np.testing.assert_allclose(
        np.asarray(wbox), [10 - SHIFT, 12.0, 40 - SHIFT, 50.0], atol=1e-4)


def test_cycle_loss_zero_when_consistent():
    K, depth, T1, T2, crop, ratio = scene()
    box1 = jnp.array([[10.0, 12.0, 40.0, 50.0]])
    box2 = jnp.array([[10.0 - SHIFT, 12.0, 40.0 - SHIFT, 50.0]])
    args = (jnp.stack([K]), jnp.stack([depth]), jnp.stack([T1]),
            jnp.stack([crop]), jnp.stack([ratio]),
            jnp.stack([K]), jnp.stack([depth]), jnp.stack([T2]),
            jnp.stack([crop]), jnp.stack([ratio]))
    valid = jnp.ones((1,), bool)
    loss_consistent = cycle_overlap_loss(box1, box2, *args, valid)
    assert float(loss_consistent) < 0.02

    # Inconsistent prediction: box2 off by 15 px -> clearly larger loss.
    box2_bad = box2 + jnp.array([15.0, 0.0, 15.0, 0.0])
    loss_bad = cycle_overlap_loss(box1, box2_bad, *args, valid)
    assert float(loss_bad) > float(loss_consistent) + 0.1

    # Invalid pair masks to zero.
    loss_masked = cycle_overlap_loss(box1, box2, *args, jnp.zeros((1,), bool))
    assert float(loss_masked) == 0.0


@pytest.mark.slow
def test_full_cycle_train_step():
    """make_train_step(full_cycle=True) runs end-to-end on a geometry batch."""
    import optax

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.training import create_train_state, make_train_step

    K, depth, T1, T2, crop, ratio = scene()
    model_cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3",
                                last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(8, 8)))
    train_cfg = TrainConfig(batch_size=2, image_size=(H, W))
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.key(0), (H, W))
    step = make_train_step(model, tx, full_cycle=True)
    b = 2
    tile = lambda x: jnp.tile(x[None], (b,) + (1,) * x.ndim)
    batch = {
        "image1": jnp.full((b, H, W, 3), 0.4), "image2": jnp.full(
            (b, H, W, 3), 0.6),
        "overlap_box1": tile(jnp.array([10.0, 12.0, 40.0, 50.0])),
        "overlap_box2": tile(jnp.array([10 - SHIFT, 12.0, 40 - SHIFT, 50.0])),
        "overlap_valid": jnp.ones((b,), bool),
        "K1": tile(K), "K2": tile(K), "depth1": tile(depth),
        "depth2": tile(depth), "pose1": tile(T1), "pose2": tile(T2),
        "crop1": tile(crop), "crop2": tile(crop), "ratio1": tile(ratio),
        "ratio2": tile(ratio),
    }
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "cycle_overlap_loss" in metrics
    assert np.isfinite(float(metrics["cycle_overlap_loss"]))


def test_cycle_loss_grad_flows_to_pred():
    K, depth, T1, T2, crop, ratio = scene()
    args = (jnp.stack([K]), jnp.stack([depth]), jnp.stack([T1]),
            jnp.stack([crop]), jnp.stack([ratio]),
            jnp.stack([K]), jnp.stack([depth]), jnp.stack([T2]),
            jnp.stack([crop]), jnp.stack([ratio]))
    valid = jnp.ones((1,), bool)
    box1 = jnp.array([[10.0, 12.0, 40.0, 50.0]])

    def f(b2):
        return cycle_overlap_loss(box1, b2, *args, valid)

    g = jax.grad(f)(jnp.array([[20.0, 12.0, 45.0, 50.0]]))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
