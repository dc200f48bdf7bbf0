"""LoFTR coarse-level training: dual-softmax supervision (paper eq. 5).

Completes the matcher-family training recipes (reference ships only a
wrapper around the outdoor_ds checkpoint,
dloc/core/matchers/loftr.py:24-61): minimize the negative log of the
dual-softmax confidence at ground-truth coarse cell correspondences.
GT rides as ``gt_matches0`` [B, N] — for each coarse cell of image0 the
matching cell index in image1, or -1 when unmatched/occluded.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


def loftr_coarse_loss(coarse_conf: Array, gt_matches0: Array,
                      eps: float = 1e-6) -> Array:
    """Mean -log(conf[i, gt(i)]) over supervised cells.

    coarse_conf: [B, N, N] dual-softmax probabilities; gt_matches0 [B, N].
    """
    has_gt = gt_matches0 >= 0
    col = jnp.clip(gt_matches0, 0, coarse_conf.shape[-1] - 1)
    p = jnp.take_along_axis(coarse_conf, col[:, :, None], axis=2)[..., 0]
    ll = jnp.where(has_gt, jnp.log(jnp.maximum(p, eps)), 0.0)
    return -jnp.sum(ll) / jnp.maximum(jnp.sum(has_gt), 1)


def make_loftr_train_step(model, tx):
    """jit'd (params, opt_state, image0, image1, gt_matches0) step."""
    @partial(jax.jit)
    def step(params, opt_state, image0, image1, gt_matches0):
        def loss_fn(p):
            out = model.apply(p, image0, image1)
            loss = loftr_coarse_loss(out["coarse_conf"], gt_matches0)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # Coarse accuracy: argmax row assignment vs GT.
        pred = jnp.argmax(out["coarse_conf"], axis=2)
        has_gt = gt_matches0 >= 0
        acc = jnp.sum(jnp.where(has_gt, pred == gt_matches0, False)) / \
            jnp.maximum(jnp.sum(has_gt), 1)
        return params, opt_state, {"loss": loss, "coarse_acc": acc}

    return step


def shift_pair_gt(hw: tuple[int, int], shift_xy: tuple[int, int]) -> Array:
    """GT coarse matches for image1 = image0 shifted by (dx, dy) pixels.

    Cell i=(r, c) of image0 maps to (r + dy/8, c + dx/8) in image1;
    out-of-range cells get -1. Shifts must be multiples of 8.
    """
    h, w = hw
    hc, wc = h // 8, w // 8
    dx, dy = shift_xy
    assert dx % 8 == 0 and dy % 8 == 0
    rr, cc = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    r2 = rr + dy // 8
    c2 = cc + dx // 8
    ok = (r2 >= 0) & (r2 < hc) & (c2 >= 0) & (c2 < wc)
    gt = jnp.where(ok, r2 * wc + c2, -1)
    return gt.reshape(1, hc * wc)
