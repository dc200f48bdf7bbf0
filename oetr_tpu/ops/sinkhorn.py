"""Log-domain Sinkhorn optimal transport with dustbins — masked & static.

The matching core of SuperGlue (the reference only ships a wrapper around
an empty submodule, /root/reference/dloc/core/matchers/superglue.py:21-64;
iteration counts/thresholds from dloc/core/match_features.py:23-63).
Implemented from the SuperGlue paper's formulation: augment the score
matrix with a learnable dustbin row/column, run Sinkhorn normalization in
log space, with per-batch validity masks so padded keypoints carry zero
mass — fully static shapes for TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray
NEG_INF = -1e9


def log_sinkhorn(log_cost: Array, log_mu: Array, log_nu: Array,
                 iters: int) -> Array:
    """Sinkhorn iterations in log space.

    Args:
      log_cost: [B, M, N] augmented score matrix.
      log_mu: [B, M] log row marginals; log_nu: [B, N] log col marginals.
    Returns:
      [B, M, N] log transport plan.
    """
    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(log_cost + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(log_cost + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    return log_cost + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: Array, alpha: Array, iters: int,
                          mask0: Array | None = None,
                          mask1: Array | None = None,
                          use_pallas: bool = False) -> Array:
    """SuperGlue-style partial optimal transport with dustbins.

    Args:
      scores: [B, M, N] similarity matrix.
      alpha: scalar learnable dustbin score.
      iters: Sinkhorn iterations (reference confs: 20-30,
        match_features.py:29,41,61).
      mask0: [B, M] bool validity of rows; mask1: [B, N] of cols.

    Returns:
      [B, M+1, N+1] log assignment matrix; exp sums to ~(valid M + valid N)
      per batch element (each real keypoint contributes one unit of mass;
      dustbins absorb the unmatched).
    """
    b, m, n = scores.shape
    # OT iterations run in f32 regardless of the model's compute dtype:
    # 20-30 alternating logsumexp normalizations drift visibly in bf16
    # (SURVEY.md §7 "Sinkhorn numerical parity ... without drift"), and
    # the [M, N] matrix is small next to the GNN that produced it.
    scores = scores.astype(jnp.float32)
    dtype = scores.dtype
    if mask0 is None:
        mask0 = jnp.ones((b, m), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n), bool)

    pair = mask0[:, :, None] & mask1[:, None, :]
    scores = jnp.where(pair, scores, NEG_INF)

    alpha = jnp.asarray(alpha, dtype)
    bins0 = jnp.where(mask0, alpha, NEG_INF)[:, :, None]      # [B, M, 1]
    bins1 = jnp.where(mask1, alpha, NEG_INF)[:, None, :]      # [B, 1, N]
    corner = jnp.full((b, 1, 1), alpha, dtype)
    aug = jnp.concatenate([
        jnp.concatenate([scores, bins0], axis=2),
        jnp.concatenate([bins1, corner], axis=2),
    ], axis=1)                                                 # [B, M+1, N+1]

    ms = jnp.sum(mask0, axis=1).astype(dtype)                  # [B]
    ns = jnp.sum(mask1, axis=1).astype(dtype)
    # Marginals: each valid keypoint has mass 1; dustbin row/col absorb the
    # other side's total. Normalized by (ms + ns) like the paper.
    norm = -jnp.log(jnp.maximum(ms + ns, 1.0))                 # [B]
    log_mu = jnp.concatenate([
        jnp.where(mask0, norm[:, None], NEG_INF),
        (jnp.log(jnp.maximum(ns, 1e-9)) + norm)[:, None],
    ], axis=1)                                                 # [B, M+1]
    log_nu = jnp.concatenate([
        jnp.where(mask1, norm[:, None], NEG_INF),
        (jnp.log(jnp.maximum(ms, 1e-9)) + norm)[:, None],
    ], axis=1)                                                 # [B, N+1]

    if use_pallas:
        from .pallas_sinkhorn import log_sinkhorn_pallas
        Z = log_sinkhorn_pallas(aug, log_mu, log_nu, iters,
                                interpret=jax.default_backend() == "cpu")
    else:
        Z = log_sinkhorn(aug, log_mu, log_nu, iters)
    return Z - norm[:, None, None]


def extract_matches(log_assignment: Array, threshold: float,
                    mask0: Array | None = None,
                    mask1: Array | None = None):
    """Mutual-argmax match extraction from the OT plan (SuperGlue rule).

    Args:
      log_assignment: [B, M+1, N+1].
    Returns:
      matches0 [B, M] int (-1 = unmatched), matches1 [B, N],
      mscores0 [B, M], mscores1 [B, N].
    """
    probs = jnp.exp(log_assignment[:, :-1, :-1])               # [B, M, N]
    b, m, n = probs.shape
    max0 = jnp.max(probs, axis=2)
    idx0 = jnp.argmax(probs, axis=2)
    max1 = jnp.max(probs, axis=1)
    idx1 = jnp.argmax(probs, axis=1)

    arange_m = jnp.arange(m)[None, :]
    arange_n = jnp.arange(n)[None, :]
    mutual0 = jnp.take_along_axis(idx1, idx0, axis=1) == arange_m
    mutual1 = jnp.take_along_axis(idx0, idx1, axis=1) == arange_n

    valid0 = mutual0 & (max0 > threshold)
    if mask0 is not None:
        valid0 = valid0 & mask0
    valid1 = mutual1 & jnp.take_along_axis(valid0, idx1, axis=1)
    if mask1 is not None:
        valid1 = valid1 & mask1

    matches0 = jnp.where(valid0, idx0, -1)
    matches1 = jnp.where(valid1, idx1, -1)
    mscores0 = jnp.where(valid0, max0, 0.0)
    mscores1 = jnp.where(valid1, max1, 0.0)
    return matches0, matches1, mscores0, mscores1
