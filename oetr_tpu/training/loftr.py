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


def warp_cell_centers_batch(xy0: Array, depth0: Array, K0: Array,
                            T_0to1: Array, K1: Array,
                            depth1: Array | None = None,
                            occlusion_thresh: float = 0.5
                            ) -> tuple[Array, Array]:
    """Continuous warp of image-0 points into image 1 via depth + pose.

    The fine-supervision companion of ``superglue.gt_matches_batch``
    (which discretizes to mutual-nearest cell assignments): returns the
    exact sub-pixel correspondence of each point, which is what the fine
    correlation refinement must regress to (LoFTR paper eq. 7 target).

    Args:
      xy0: [B, N, 2] pixel positions in image 0.
      depth0: [B, H, W]; K0, K1: [B, 3, 3]; T_0to1: [B, 4, 4].
      depth1: optional [B, H, W] for the occlusion check.
    Returns:
      (xy1 [B, N, 2] continuous warped positions, valid [B, N]).
    """
    from .losses import interpolate_depth

    def one(xy0_, d0, K0_, T_, K1_, d1):
        z, ok = interpolate_depth(d0, xy0_)
        x = (xy0_[:, 0] - K0_[0, 2]) * z / K0_[0, 0]
        y = (xy0_[:, 1] - K0_[1, 2]) * z / K0_[1, 1]
        P = jnp.stack([x, y, z], axis=-1)
        Pc2 = P @ T_[:3, :3].T + T_[:3, 3]
        uv = Pc2 @ K1_.T
        xy2 = uv[:, :2] / jnp.where(jnp.abs(uv[:, 2:]) > 1e-9,
                                    uv[:, 2:], 1e-9)
        ok = ok & (Pc2[:, 2] > 1e-6)
        if d1 is not None:
            z2, ok2 = interpolate_depth(d1, xy2)
            ok = ok & ok2 & (jnp.abs(Pc2[:, 2] - z2) < occlusion_thresh)
        return xy2, ok

    if depth1 is None:
        return jax.vmap(lambda a, b, c, d, e: one(a, b, c, d, e, None))(
            xy0, depth0, K0, T_0to1, K1)
    return jax.vmap(one)(xy0, depth0, K0, T_0to1, K1, depth1)


def loftr_fine_loss(out: dict, gt_matches0: Array, gt_xy1: Array,
                    gt_valid1: Array, reach_px: float = 4.0
                    ) -> tuple[Array, Array]:
    """L2 between the refined ``mkpts1`` and the continuous GT warp.

    Standard LoFTR fine supervision: only coarse proposals whose selected
    image-1 cell equals the GT assignment are supervised (the fine stage
    refines *correct* coarse matches; wrong ones are the coarse loss's
    problem), and only when the GT position is inside the fine window's
    reach (``reach_px`` = (fine_window//2) * fine stride = 4 px for the
    default 5-window/stride-2 — the soft-argmax cannot move further).

    Args:
      out: model output dict (needs mkpts1, mkpts1_coarse, cells0,
        cells1, valid).
      gt_matches0: [B, N] coarse GT assignment (-1 = none).
      gt_xy1: [B, N, 2] continuous warp of every image-0 cell center.
      gt_valid1: [B, N] warp validity.
    Returns:
      (normalized loss, supervised-fraction metric).
    """
    cells0, cells1 = out["cells0"], out["cells1"]
    gt_col = jnp.take_along_axis(gt_matches0, cells0, axis=1)
    tgt = jnp.take_along_axis(gt_xy1, cells0[..., None], axis=1)
    okv = jnp.take_along_axis(gt_valid1, cells0, axis=1)
    inreach = jnp.max(jnp.abs(tgt - out["mkpts1_coarse"]),
                      axis=-1) <= reach_px
    sup = out["valid"] & okv & (gt_col >= 0) & (cells1 == gt_col) & inreach
    err = (out["mkpts1"] - tgt) / reach_px
    l2 = jnp.sum(err * err, axis=-1)
    n = jnp.maximum(jnp.sum(sup), 1)
    loss = jnp.sum(jnp.where(sup, l2, 0.0)) / n
    frac = jnp.sum(sup) / sup.size
    return loss, frac


def make_loftr_train_step(model, tx, fine_weight: float = 0.0):
    """jit'd (params, opt_state, image0, image1, gt_matches0) step.

    With ``fine_weight > 0`` the step takes two extra arguments —
    ``gt_xy1`` [B, N, 2] continuous cell-center warps and ``gt_valid1``
    [B, N] (from :func:`warp_cell_centers_batch`) — and adds the fine
    refinement loss so the fine transformer/correlation head trains
    (without it the fine stage runs at eval with unsupervised weights).
    """
    @partial(jax.jit)
    def step(params, opt_state, image0, image1, gt_matches0,
             gt_xy1=None, gt_valid1=None):
        def loss_fn(p):
            out = model.apply(p, image0, image1)
            loss = loftr_coarse_loss(out["coarse_conf"], gt_matches0)
            metrics = {}
            if fine_weight:
                fine, frac = loftr_fine_loss(out, gt_matches0, gt_xy1,
                                             gt_valid1)
                loss = loss + fine_weight * fine
                metrics = {"fine_loss": fine, "fine_frac": frac}
            return loss, (out, metrics)

        (loss, (out, extra)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        # Coarse accuracy: argmax row assignment vs GT.
        pred = jnp.argmax(out["coarse_conf"], axis=2)
        has_gt = gt_matches0 >= 0
        acc = jnp.sum(jnp.where(has_gt, pred == gt_matches0, False)) / \
            jnp.maximum(jnp.sum(has_gt), 1)
        return params, opt_state, {"loss": loss, "coarse_acc": acc, **extra}

    if fine_weight:
        return step

    def step5(params, opt_state, image0, image1, gt_matches0):
        return step(params, opt_state, image0, image1, gt_matches0)
    return step5


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
