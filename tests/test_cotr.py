"""COTR correspondence transformer: shapes, masks, cycle machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.models.cotr import COTR, cotr_match, make_composite


def _tiny_cotr():
    return COTR(d_model=32, nhead=4, enc_layers=1, dec_layers=1,
                backbone_depth=18)


@pytest.mark.slow
def test_cotr_forward_shapes(rng):
    model = _tiny_cotr()
    comp = jnp.asarray(rng.uniform(0, 1, (1, 64, 128, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 1, (1, 8, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), comp, q)
    out = model.apply(params, comp, q)
    assert out.shape == (1, 8, 2)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0   # sigmoid range


@pytest.mark.slow
def test_cotr_match_contract(rng):
    model = _tiny_cotr()
    im0 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    comp = make_composite(im0, im1)
    assert comp.shape == (1, 64, 128, 3)
    q = jnp.asarray(rng.uniform(0.1, 0.9, (1, 16, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), comp, q)
    out = cotr_match(model, params, im0, im1, q)
    assert out["mkpts1"].shape == (1, 16, 2)
    assert out["valid"].dtype == bool
    assert np.all(np.isfinite(np.asarray(out["cycle_error"])))


@pytest.mark.slow
def test_cotr_grad(rng):
    model = _tiny_cotr()
    comp = jnp.asarray(rng.uniform(0, 1, (1, 32, 64, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(0, 1, (1, 4, 2)).astype(np.float32))
    params = model.init(jax.random.key(0), comp, q)
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 4, 2)).astype(np.float32))

    def loss(p):
        return jnp.mean((model.apply(p, comp, q) - tgt) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
