"""SuperGlue training: optimal-transport NLL loss + train step.

The weights story for the matcher family (README "Weights policy"): the
reference ships only a wrapper around downloaded SuperGlue checkpoints
(/root/reference/dloc/core/matchers/superglue.py:21-64), so training is
new scope. Loss follows the SuperGlue paper: minimize the negative
log-likelihood of the ground-truth partial assignment under the Sinkhorn
transport plan — matched pairs (i, j) at Z[i, j], unmatched keypoints at
their dustbin entries (row M / column N).

Ground truth rides as ``gt_matches0`` [B, M] int (index into image-1
keypoints, -1 = unmatched -> dustbin) with validity masks; everything is
static-shape.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


def superglue_nll_loss(log_assignment: Array, gt_matches0: Array,
                       valid0: Array, valid1: Array) -> Array:
    """Mean NLL of the GT assignment under the [B, M+1, N+1] OT plan.

    gt_matches0: [B, M] with -1 for unmatched (dustbin). Keypoints of
    image 1 that no gt match points at are counted at the dustbin row.
    """
    b, m1, n1 = log_assignment.shape
    m, n = m1 - 1, n1 - 1

    # Rows: each valid image-0 keypoint hits its match or the dustbin col.
    col = jnp.where(gt_matches0 >= 0, gt_matches0, n)          # [B, M]
    row_ll = jnp.take_along_axis(
        log_assignment[:, :m, :], col[:, :, None], axis=2)[..., 0]
    row_ll = jnp.where(valid0, row_ll, 0.0)

    # Columns: image-1 keypoints nobody matched hit the dustbin row.
    matched1 = jnp.zeros((b, n), bool)
    idx = jnp.clip(gt_matches0, 0, n - 1)
    matched1 = jax.vmap(
        lambda m1_, i, v: m1_.at[i].max(v))(matched1, idx,
                                            (gt_matches0 >= 0) & valid0)
    unmatched1 = valid1 & ~matched1
    col_ll = jnp.where(unmatched1, log_assignment[:, m, :n], 0.0)

    denom = (jnp.sum(valid0, axis=1) + jnp.sum(unmatched1, axis=1))
    per_b = -(jnp.sum(row_ll, axis=1) + jnp.sum(col_ll, axis=1)) / \
        jnp.maximum(denom, 1.0)
    return jnp.mean(per_b)


def gt_matches_batch(xy0: Array, v0: Array, xy1: Array, v1: Array,
                     depth0: Array, K0: Array, T_0to1: Array, K1: Array,
                     depth1: Array | None = None,
                     radius: float = 3.0,
                     occlusion_thresh: float = 0.5) -> Array:
    """Batched GT partial assignment from known geometry (all-jnp).

    Replaces the per-pair numpy GT path (scripts/train_matching_demo.py:
    gt_matches_from_geometry) so assignment targets can be produced
    inside the same jit program that generates the pairs and extracts
    features — the on-the-fly SuperGlue data pipeline. Rule: warp image-0
    keypoints through depth+pose, mutual-nearest under Euclidean
    distance, accept within ``radius`` px; optional occlusion check
    against image1's depth (same convention as the GT overlap box,
    geometry/overlap.py:119).

    Args:
      xy0, xy1: [B, K, 2] keypoints; v0, v1 [B, K] validity.
      depth0: [B, H, W]; K0, K1: [B, 3, 3]; T_0to1: [B, 4, 4].
    Returns:
      gt_matches0 [B, K] int32 (-1 = unmatched).
    """
    from .losses import interpolate_depth

    def one(xy0_, v0_, xy1_, v1_, d0, K0_, T_, K1_, d1):
        z, ok = interpolate_depth(d0, xy0_)
        x = (xy0_[:, 0] - K0_[0, 2]) * z / K0_[0, 0]
        y = (xy0_[:, 1] - K0_[1, 2]) * z / K0_[1, 1]
        P = jnp.stack([x, y, z], axis=-1)
        Pc2 = P @ T_[:3, :3].T + T_[:3, 3]
        uv = Pc2 @ K1_.T
        xy2 = uv[:, :2] / jnp.where(jnp.abs(uv[:, 2:]) > 1e-9,
                                    uv[:, 2:], 1e-9)
        ok = ok & (Pc2[:, 2] > 1e-6) & v0_
        if d1 is not None:
            z2, ok2 = interpolate_depth(d1, xy2)
            ok = ok & ok2 & (jnp.abs(Pc2[:, 2] - z2) < occlusion_thresh)
        d = jnp.linalg.norm(xy2[:, None] - xy1_[None], axis=-1)   # [K, K]
        big = jnp.float32(1e9)
        d = jnp.where(ok[:, None] & v1_[None, :], d, big)
        nn1 = jnp.argmin(d, axis=1)
        best = jnp.min(d, axis=1)
        nn0 = jnp.argmin(d, axis=0)
        mutual = nn0[nn1] == jnp.arange(xy0_.shape[0])
        return jnp.where((best < radius) & mutual, nn1, -1).astype(jnp.int32)

    if depth1 is None:
        return jax.vmap(lambda a, b, c, d, e, f, g, h: one(
            a, b, c, d, e, f, g, h, None))(
            xy0, v0, xy1, v1, depth0, K0, T_0to1, K1)
    return jax.vmap(one)(xy0, v0, xy1, v1, depth0, K0, T_0to1, K1, depth1)


def make_superglue_train_step(model, tx):
    """jit'd (params, opt_state, batch) -> (params, opt_state, metrics).

    batch: the SuperGlue input dict plus gt_matches0 [B, M].
    """
    @partial(jax.jit, static_argnames=("image_hw0", "image_hw1"))
    def _step(params, opt_state, batch, image_hw0, image_hw1):
        batch = dict(batch, image_hw0=image_hw0, image_hw1=image_hw1)

        def loss_fn(p):
            out = model.apply(p, batch)
            loss = superglue_nll_loss(out["log_assignment"],
                                      batch["gt_matches0"],
                                      batch["valid0"], batch["valid1"])
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        matches0 = out["matches0"]
        acc = jnp.mean(jnp.where(
            batch["valid0"],
            matches0 == batch["gt_matches0"], False).astype(jnp.float32))
        return params, opt_state, {"loss": loss, "match_acc": acc}

    def step(params, opt_state, batch):
        # image_hw tuples are shape-like statics, not data — keep them
        # out of the traced pytree.
        b = dict(batch)
        hw0 = tuple(b.pop("image_hw0"))
        hw1 = tuple(b.pop("image_hw1"))
        return _step(params, opt_state, b, hw0, hw1)

    return step
