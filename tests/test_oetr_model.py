"""OETR model: shapes, determinism, masks, gradient flow.

The reference has no unit tests (SURVEY.md §4); these pin the contracts of
src/model.py:229-252 (forward_dummy) in the JAX build.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.config import BackboneConfig, NeckConfig, OETRConfig
from oetr_tpu.models import build_oetr, sine_position_encoding


@pytest.fixture(scope="module")
def tiny_cfg():
    # ResNet18 + tiny transformer for fast CPU tests.
    return OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(20, 20)),
    )


@pytest.fixture(scope="module")
def tiny_model_and_params(tiny_cfg):
    model = build_oetr(tiny_cfg)
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.key(0), img, img)
    return model, params


def test_forward_shapes(tiny_model_and_params):
    model, params = tiny_model_and_params
    img1 = jnp.ones((2, 128, 128, 3), jnp.float32) * 0.5
    img2 = jnp.ones((2, 128, 128, 3), jnp.float32) * 0.3
    out = model.apply(params, img1, img2)
    assert out["pred_bbox1"].shape == (2, 4)
    assert out["pred_bbox2"].shape == (2, 4)
    assert out["center1"].shape == (2, 2)
    assert out["tlbr1"].shape == (2, 4)
    # stride 32: 128/32 = 4 -> 16 tokens
    assert out["prob_map1"].shape == (2, 16)
    np.testing.assert_allclose(np.asarray(out["prob_map1"].sum(-1)), 1.0,
                               atol=1e-5)


def test_boxes_within_image(tiny_model_and_params):
    model, params = tiny_model_and_params
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)),
                      jnp.float32)
    out = model.apply(params, img, img)
    b = np.asarray(out["pred_bbox1"][0])
    assert 0 <= b[0] <= 128 and 0 <= b[1] <= 128
    assert b[0] <= b[2] and b[1] <= b[3]


def test_mask_excludes_padding(tiny_model_and_params):
    model, params = tiny_model_and_params
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    # Valid region = left half of the feature map (stride 32 -> 4x4).
    mask = np.zeros((1, 4, 4), bool)
    mask[:, :, :2] = True
    out = model.apply(params, img, img, jnp.asarray(mask), jnp.asarray(mask))
    prob = np.asarray(out["prob_map1"]).reshape(1, 4, 4)
    assert prob[:, :, 2:].max() < 1e-6  # no mass on masked positions
    # Soft-argmax center must lie in the valid half (x < 64 px).
    assert float(out["center1"][0, 0]) < 64.0


def test_cycle_outputs(tiny_model_and_params):
    model, params = tiny_model_and_params
    img = jnp.ones((1, 128, 128, 3), jnp.float32) * 0.4
    out = model.apply(params, img, img, with_cycle=True)
    assert "cycle_center1" in out and out["cycle_center1"].shape == (1, 2)


@pytest.mark.slow
def test_gradients_flow(tiny_cfg, tiny_model_and_params):
    model, params = tiny_model_and_params
    img = jnp.ones((1, 128, 128, 3), jnp.float32) * 0.4

    def loss_fn(p):
        out = model.apply(p, img, img)
        return jnp.sum(out["pred_bbox1"]) + jnp.sum(out["pred_bbox2"])

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0.0


def test_position_encoding_shapes():
    pe = sine_position_encoding(64, (20, 20), legacy=True)
    assert pe.shape == (20, 20, 64)
    pe_fixed = sine_position_encoding(64, (20, 20), legacy=False)
    # The legacy spectrum collapses high-frequency channels; the two tables
    # must genuinely differ (guards against silently dropping the flag).
    assert float(jnp.abs(pe - pe_fixed).max()) > 0.1


@pytest.mark.slow
def test_non_square_inputs(tiny_model_and_params):
    model, params = tiny_model_and_params
    img1 = jnp.ones((1, 96, 128, 3), jnp.float32) * 0.5
    img2 = jnp.ones((1, 128, 96, 3), jnp.float32) * 0.5
    out = model.apply(params, img1, img2)
    b1 = np.asarray(out["pred_bbox1"][0])
    assert b1[2] <= 128.0 and b1[3] <= 96.0


def test_parity_modules_cbam_patchembed(rng):
    """ChannelAttention/SpatialAttention/PatchEmbed (ref parity modules,
    transformer.py:386-422 + backbone.py:70-127)."""
    import jax
    from oetr_tpu.models.oetr import PatchEmbed
    from oetr_tpu.models.transformer import (ChannelAttention,
                                             SpatialAttention)

    x_tok = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    ca = ChannelAttention(d_model=32, reduction=4)
    y = ca.apply(ca.init(jax.random.key(0), x_tok), x_tok)
    assert y.shape == x_tok.shape
    # Gate in (0, 1): output magnitude never exceeds input.
    assert float(jnp.abs(y).max()) <= float(jnp.abs(x_tok).max()) + 1e-6

    x_img = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    sa = SpatialAttention(kernel_size=3)
    y = sa.apply(sa.init(jax.random.key(0), x_img), x_img)
    assert y.shape == x_img.shape

    pe = PatchEmbed(patch_size=4, embed_dim=24)
    y = pe.apply(pe.init(jax.random.key(0), x_img), x_img)
    assert y.shape == (2, 2, 2, 24)


def test_profiling_helpers(tmp_path):
    from oetr_tpu.utils.profiling import ScalarWriter, device_memory_stats

    stats = device_memory_stats()
    assert isinstance(stats, dict)

    w = ScalarWriter(str(tmp_path / "tb"))
    w.write(1, {"loss": 0.5, "iou": 0.9})
    w.write(2, {"loss": 0.4})
    w.close()
    import os
    assert len(os.listdir(tmp_path / "tb")) >= 1


@pytest.mark.quick
def test_stem_s2d_exact_equivalence(rng):
    """Space-to-depth stem == 7x7/s2 stem after kernel remapping (the
    TPU MXU-occupancy optimization must not change the math)."""
    import flax

    from oetr_tpu.models.resnet import ResNetEncoder, space_to_depth_kernel

    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    enc = ResNetEncoder(depth=18, stop_layer="layer2", norm="gn")
    p = enc.init(jax.random.key(0), x)
    enc2 = ResNetEncoder(depth=18, stop_layer="layer2", norm="gn",
                         stem_s2d=True)
    f = flax.traverse_util.flatten_dict(p["params"])
    f2 = dict(f)
    f2[("Conv_0", "kernel")] = space_to_depth_kernel(f[("Conv_0", "kernel")])
    p2 = {"params": flax.traverse_util.unflatten_dict(f2)}
    o1 = enc.apply(p, x)
    o2 = enc2.apply(p2, x)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-4)
