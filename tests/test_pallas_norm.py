"""Fused GN+ReLU+maxpool Pallas kernel (ops/pallas_norm.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.ops.pallas_norm import (groupnorm_relu_maxpool,
                                      groupnorm_relu_maxpool_reference,
                                      groupnorm_relu_maxpool_trainable)


@pytest.mark.parametrize("shape,toh,ng", [
    ((2, 40, 24, 8), 5, 4),
    ((1, 64, 32, 64), 8, 32),
    ((2, 48, 48, 16), 4, 8),
])
def test_fused_gn_pool_parity(rng, shape, toh, ng):
    b, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bt = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    ref = groupnorm_relu_maxpool_reference(x, g, bt, num_groups=ng)
    out = groupnorm_relu_maxpool(x, g, bt, num_groups=ng, toh=toh,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_gn_pool_grad(rng):
    """custom_vjp backward (XLA-reference recompute) matches the
    reference path's gradients."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    bt = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss_fused(x, g, bt):
        return jnp.sum(groupnorm_relu_maxpool_trainable(x, g, bt, 4, 1e-5, 4)
                       ** 2)

    def loss_ref(x, g, bt):
        return jnp.sum(groupnorm_relu_maxpool_reference(x, g, bt, 4) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, bt)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, bt)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_fused_stem_encoder_checkpoint_compat(rng):
    """fused_stem=True produces the identical param tree and (to float
    tolerance) the same features as the unfused encoder."""
    from oetr_tpu.models.resnet import ResNetEncoder

    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    enc0 = ResNetEncoder(depth=18, stop_layer="layer1", fused_stem=False)
    enc1 = ResNetEncoder(depth=18, stop_layer="layer1", fused_stem=True)
    p0 = enc0.init(jax.random.key(0), x)
    p1 = enc1.init(jax.random.key(0), x)
    assert (jax.tree.structure(p0) == jax.tree.structure(p1))
    y0 = enc0.apply(p0, x)
    y1 = enc1.apply(p0, x)        # unfused params through fused path
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-4)
