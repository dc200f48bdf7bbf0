"""LoFTR coarse training: dual-softmax loss decreases and coarse cell
accuracy improves on a known-shift pair; fine refinement supervision."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from oetr_tpu.models import LoFTR
from oetr_tpu.training.loftr import (loftr_coarse_loss, loftr_fine_loss,
                                     make_loftr_train_step, shift_pair_gt,
                                     warp_cell_centers_batch)


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


def test_fine_loss_supervision_mask():
    # 1 batch, 2 selected matches: first has correct coarse cell and an
    # in-reach target 2px from the refined point; second picked the
    # WRONG cell -> excluded from supervision.
    out = {
        "cells0": jnp.array([[0, 1]]),
        "cells1": jnp.array([[3, 2]]),
        "mkpts1": jnp.array([[[10.0, 10.0], [50.0, 50.0]]]),
        "mkpts1_coarse": jnp.array([[[11.0, 10.0], [50.0, 50.0]]]),
        "valid": jnp.array([[True, True]]),
    }
    gt_matches0 = jnp.array([[3, 5]])          # cell1 of match 1 != gt 5
    gt_xy1 = jnp.array([[[12.0, 10.0], [48.0, 48.0]]])
    gt_valid1 = jnp.array([[True, True]])
    loss, frac = loftr_fine_loss(out, gt_matches0, gt_xy1, gt_valid1)
    # only the first match supervised: err = (2/4)^2 = 0.25
    assert abs(float(loss) - 0.25) < 1e-6
    assert abs(float(frac) - 0.5) < 1e-6
    # out-of-reach target (>4px from coarse pos) drops supervision.
    far = dict(out, mkpts1_coarse=jnp.array([[[20.0, 10.0],
                                              [50.0, 50.0]]]))
    loss2, frac2 = loftr_fine_loss(far, gt_matches0, gt_xy1, gt_valid1)
    assert float(frac2) == 0.0 and float(loss2) == 0.0


def test_warp_cell_centers_identity():
    # Identity pose + constant depth: points warp onto themselves.
    xy = jnp.asarray(np.random.default_rng(0).uniform(4, 28, (1, 6, 2)),
                     jnp.float32)
    depth = jnp.full((1, 32, 32), 5.0)
    K = jnp.asarray(np.array([[[20.0, 0, 16], [0, 20.0, 16],
                               [0, 0, 1]]]), jnp.float32)
    T = jnp.tile(jnp.eye(4)[None], (1, 1, 1))
    xy1, ok = warp_cell_centers_batch(xy, depth, K, T, K, depth1=depth)
    assert bool(jnp.all(ok))
    assert float(jnp.max(jnp.abs(xy1 - xy))) < 1e-3


@pytest.mark.slow
def test_loftr_fine_trains_subcell_shift(rng):
    # Image 1 is image 0 shifted by a NON-multiple-of-8 amount: the
    # coarse stage can only be right to the nearest cell; the fine stage
    # must regress the 2px remainder. After training with fine_weight,
    # the refined mkpts1 must beat the coarse quantization error.
    from oetr_tpu.data.synthetic import _texture

    g = np.random.default_rng(7)
    canvas = _texture(g, 96, 96).astype(np.float32).mean(-1) / 255.0
    dx, dy = 10, 6                      # content moves by (-10, -6)
    img0 = canvas[8:72, 16:80]
    img1 = canvas[8 + dy:72 + dy, 16 + dx:80 + dx]
    hw = 64
    hc = hw // 8
    # coarse GT: nearest cell of the true shift (-10, -6) -> (-8, -8).
    gt = shift_pair_gt((hw, hw), (-8, -8))
    # continuous GT: exact warp of each cell center.
    u = np.arange(hc) * 8 + 3.5
    gy, gx = np.meshgrid(u, u, indexing="ij")
    ctr = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    gt_xy1 = jnp.asarray((ctr - np.array([dx, dy]))[None], jnp.float32)
    gt_ok1 = jnp.ones((1, hc * hc), bool)

    i0 = jnp.asarray(img0)[None, :, :, None]
    i1 = jnp.asarray(img1)[None, :, :, None]
    model = LoFTR(d_coarse=64, d_fine=32, coarse_layers=1, fine_layers=1,
                  nhead=4, max_matches=32, match_threshold=0.0)
    params = model.init(jax.random.key(0), i0, i1)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    step = make_loftr_train_step(model, tx, fine_weight=1.0)

    for _ in range(60):
        params, opt_state, m = step(params, opt_state, i0, i1, gt,
                                    gt_xy1, gt_ok1)
    assert np.isfinite(float(m["loss"]))
    assert float(m["fine_frac"]) > 0.1, "fine stage never supervised"

    out = model.apply(params, i0, i1)
    v = np.asarray(out["valid"][0])
    cells0 = np.asarray(out["cells0"][0])
    tgt = np.asarray(gt_xy1[0])[cells0]
    refined = np.abs(np.asarray(out["mkpts1"][0]) - tgt)[v]
    coarse = np.abs(np.asarray(out["mkpts1_coarse"][0]) - tgt)[v]
    # supervise only matches whose coarse cell was right (reachable).
    reach = (np.abs(np.asarray(out["mkpts1_coarse"][0]) - tgt)
             .max(-1) <= 4.0)[v]
    assert reach.sum() >= 5
    med_ref = np.median(refined[reach].max(-1))
    med_coarse = np.median(coarse[reach].max(-1))
    assert med_ref < 0.7 * med_coarse, (med_ref, med_coarse)


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
