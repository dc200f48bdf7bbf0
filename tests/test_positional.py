"""DETR-style mask-aware positional embedding (ref: src/models/utils.py:208-253)."""
import jax.numpy as jnp
import numpy as np

from oetr_tpu.models import detr_position_embedding


def test_shape_and_range():
    mask = jnp.ones((2, 6, 9), bool)
    pe = detr_position_embedding(mask, 128)
    assert pe.shape == (2, 6, 9, 128)
    a = np.asarray(pe)
    assert np.isfinite(a).all()
    assert a.min() >= -1.0 and a.max() <= 1.0


def test_normalized_extent_invariant_to_padding():
    """With normalize=True, the valid region spans the same coordinate
    range regardless of padding width: the PE at corresponding fractional
    positions must agree between a full image and a padded one."""
    full = jnp.ones((1, 4, 8), bool)
    padded = jnp.zeros((1, 4, 16), bool).at[:, :, :8].set(True)
    pe_full = detr_position_embedding(full, 64)
    pe_pad = detr_position_embedding(padded, 64)
    np.testing.assert_allclose(np.asarray(pe_full[0, :, 7]),
                               np.asarray(pe_pad[0, :, 7]), atol=1e-5)


def test_unnormalized_is_raw_cumsum_phase():
    mask = jnp.ones((1, 3, 3), bool)
    pe = detr_position_embedding(mask, 8, normalize=False)
    # First channel pair of pos_y at row r is sin/cos(r+1 / T^0) = sin(r+1).
    np.testing.assert_allclose(np.asarray(pe[0, :, 0, 0]),
                               np.sin([1.0, 2.0, 3.0]), atol=1e-6)
