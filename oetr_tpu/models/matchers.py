"""Descriptor matchers: nearest-neighbor with ratio/distance/mutual tests.

Port of the reference's only self-contained matcher
(/root/reference/dloc/core/matchers/nearest_neighbor.py:15-67) to masked,
batched jnp — the simplest matcher and the harness for the rest of the
stack (SURVEY.md §7 step 7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray
NEG_INF = -1e9


def find_nn(sim: Array, ratio_thresh: float | None,
            distance_thresh: float | None,
            valid_cols: Array | None = None):
    """Row-wise nearest neighbor with optional Lowe ratio/distance tests.

    Ref semantics: nearest_neighbor.py:15-26 (cosine sim -> squared
    descriptor distance 2*(1-sim); ratio test on distances).

    Args:
      sim: [B, M, N] cosine similarity; valid_cols: [B, N] bool.
    Returns:
      matches [B, M] int (-1 invalid), scores [B, M].
    """
    if valid_cols is not None:
        sim = jnp.where(valid_cols[:, None, :], sim, NEG_INF)
    sim_nn, ind_nn = jax.lax.top_k(sim, 2)
    dist_nn = 2.0 * (1.0 - sim_nn)
    mask = jnp.ones(sim.shape[:2], bool)
    if ratio_thresh is not None:
        mask = mask & (dist_nn[..., 0] <= ratio_thresh ** 2 * dist_nn[..., 1])
    if distance_thresh is not None:
        mask = mask & (dist_nn[..., 0] <= distance_thresh ** 2)
    matches = jnp.where(mask, ind_nn[..., 0], -1)
    scores = jnp.where(mask, (sim_nn[..., 0] + 1) / 2, 0.0)
    return matches, scores


def mutual_check(m0: Array, m1: Array) -> Array:
    """Keep m0 matches whose reverse match points back (ref: :28-33)."""
    b, m = m0.shape
    inds0 = jnp.arange(m)[None, :]
    loop = jnp.take_along_axis(m1, jnp.clip(m0, 0, None), axis=1)
    ok = (m0 > -1) & (inds0 == loop)
    return jnp.where(ok, m0, -1)


def nearest_neighbor_match(desc0: Array, desc1: Array,
                           valid0: Array | None = None,
                           valid1: Array | None = None,
                           ratio_threshold: float | None = None,
                           distance_threshold: float | None = None,
                           do_mutual_check: bool = True) -> dict:
    """Full NN matcher (ref NearestNeighbor._forward, :36-67).

    Args:
      desc0: [B, M, D], desc1: [B, N, D] unit-norm descriptors.
      valid0/valid1: [B, M]/[B, N] keypoint validity masks.
    Returns:
      dict with matches0 [B, M], matching_scores0 [B, M].
    """
    sim = jnp.einsum("bmd,bnd->bmn", desc0, desc1)
    matches0, scores0 = find_nn(sim, ratio_threshold, distance_threshold,
                                valid1)
    if do_mutual_check:
        matches1, _ = find_nn(jnp.swapaxes(sim, 1, 2), ratio_threshold,
                              distance_threshold, valid0)
        matches0 = mutual_check(matches0, matches1)
    if valid0 is not None:
        matches0 = jnp.where(valid0, matches0, -1)
        scores0 = jnp.where(valid0, scores0, 0.0)
    return {"matches0": matches0, "matching_scores0": scores0}


def disk_brute_match(desc0: Array, desc1: Array,
                     valid0: Array | None = None,
                     valid1: Array | None = None,
                     rt: float = 0.1) -> dict:
    """Dedicated DISK brute-force matcher (the reference wraps its
    submodule's match(), dloc/core/matchers/disk_match.py:20-40, conf
    rt=0.1 :22).

    L2 brute force over unit-norm descriptors, cycle-consistent mutual
    NN, with DISK's ratio *margin*: a match survives when its best
    distance is at least ``rt`` relatively better than the runner-up,
    d_best <= (1 - rt) * d_second. Matching scores are 1.0 for kept
    matches — the reference returns constant ones (:38).
    """
    sim = jnp.einsum("bmd,bnd->bmn", desc0, desc1)

    def side(s, vcols):
        if vcols is not None:
            s = jnp.where(vcols[:, None, :], s, NEG_INF)
        sim_nn, ind_nn = jax.lax.top_k(s, 2)
        dist_nn = jnp.maximum(2.0 * (1.0 - sim_nn), 0.0)
        keep = dist_nn[..., 0] <= (1.0 - rt) * dist_nn[..., 1]
        return jnp.where(keep, ind_nn[..., 0], -1)

    m0 = side(sim, valid1)
    m1 = side(jnp.swapaxes(sim, 1, 2), valid0)
    matches0 = mutual_check(m0, m1)
    if valid0 is not None:
        matches0 = jnp.where(valid0, matches0, -1)
    scores0 = (matches0 > -1).astype(jnp.float32)
    return {"matches0": matches0, "matching_scores0": scores0}
