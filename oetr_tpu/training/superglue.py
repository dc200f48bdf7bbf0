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
