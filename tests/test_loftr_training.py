"""LoFTR coarse training: dual-softmax loss decreases and coarse cell
accuracy improves on a known-shift pair."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oetr_tpu.models import LoFTR
from oetr_tpu.training.loftr import (loftr_coarse_loss, make_loftr_train_step,
                                     shift_pair_gt)


def test_shift_pair_gt_layout():
    gt = np.asarray(shift_pair_gt((32, 32), (8, 16)))   # dx=8, dy=16
    hc = wc = 4
    assert gt.shape == (1, 16)
    # cell (0, 0) -> (2, 1) = index 9
    assert gt[0, 0] == 2 * wc + 1
    # bottom rows run out of range.
    assert gt[0, (hc - 1) * wc] == -1


def test_coarse_loss_prefers_gt():
    conf_good = np.full((1, 4, 4), 0.01, np.float32)
    gt = np.array([[1, 0, -1, 3]])
    for i, j in [(0, 1), (1, 0), (3, 3)]:
        conf_good[0, i, j] = 0.9
    conf_bad = np.full((1, 4, 4), 0.25, np.float32)
    assert float(loftr_coarse_loss(jnp.asarray(conf_good),
                                   jnp.asarray(gt))) < \
        float(loftr_coarse_loss(jnp.asarray(conf_bad), jnp.asarray(gt)))


@pytest.mark.slow
def test_loftr_coarse_trains(rng):
    from oetr_tpu.data.synthetic import _texture

    g = np.random.default_rng(5)
    canvas = _texture(g, 96, 96).astype(np.float32).mean(-1) / 255.0
    dx, dy = 16, 8
    img0 = canvas[0:64, 0:64]
    img1 = canvas[dy:dy + 64, dx:dx + 64]
    # content at img0 (x, y) appears in img1 at (x - dx, y - dy).
    gt = shift_pair_gt((64, 64), (-dx, -dy))

    i0 = jnp.asarray(img0)[None, :, :, None]
    i1 = jnp.asarray(img1)[None, :, :, None]
    model = LoFTR(d_coarse=64, d_fine=32, coarse_layers=1, fine_layers=1,
                  nhead=4, max_matches=32, match_threshold=0.0)
    params = model.init(jax.random.key(0), i0, i1)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_loftr_train_step(model, tx)

    losses, accs = [], []
    for _ in range(40):
        params, opt_state, m = step(params, opt_state, i0, i1, gt)
        losses.append(float(m["loss"]))
        accs.append(float(m["coarse_acc"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert accs[-1] > accs[0] + 0.2, (accs[0], accs[-1])
