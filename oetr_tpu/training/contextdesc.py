"""ContextDesc training: contrastive augmentation + matchability loss.

The reference ships ContextDesc only as a closed TF .pb checkpoint
(/root/reference/dloc/core/extractors/contextdesc.py:22-70); the
architecture lives in models/sift_based.ContextDesc. This module makes
it trainable from scratch (paper §3.3 semantics, modernized):

  * **InfoNCE** over GT keypoint correspondences of a homography pair —
    the augmented descriptor of keypoint i in image0 must retrieve its
    counterpart among all image1 keypoints (temperature-scaled softmax
    CE; the paper's N-pair loss is the same family);
  * **matchability BCE** — the per-keypoint matchability head predicts
    whether the keypoint has a geometric counterpart at all.

Ground truth rides as ``gt_matches0`` [B, K] int (-1 = no counterpart),
exactly the SuperGlue training convention (training/superglue.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray


def contextdesc_info_nce(desc0: Array, desc1: Array, gt_matches0: Array,
                         valid1: Array, temp: float = 0.07) -> Array:
    """Mean CE of each matched keypoint retrieving its counterpart.

    desc0/desc1: [B, K, D] unit augmented descriptors; gt_matches0:
    [B, K] int (-1 unmatched — excluded); valid1 masks the negatives.
    """
    sim = jnp.einsum("bkd,bnd->bkn", desc0, desc1) / temp
    sim = jnp.where(valid1[:, None, :], sim, -1e9)
    logp = jax.nn.log_softmax(sim, axis=-1)
    tgt = jnp.maximum(gt_matches0, 0)
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    has = gt_matches0 >= 0
    return -jnp.sum(jnp.where(has, ll, 0.0)) / jnp.maximum(
        jnp.sum(has), 1.0)


def matchability_bce(matchability: Array, gt_matches0: Array,
                     valid0: Array) -> Array:
    """BCE of the matchability head vs 'has a GT counterpart'."""
    y = (gt_matches0 >= 0).astype(jnp.float32)
    p = jnp.clip(matchability, 1e-6, 1.0 - 1e-6)
    bce = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
    return jnp.sum(jnp.where(valid0, bce, 0.0)) / jnp.maximum(
        jnp.sum(valid0), 1.0)


def make_contextdesc_train_step(net, tx, w_match: float = 0.5):
    """jit'd step over batches from :func:`contextdesc_pairs_batch`.

    step(params, opt_state, batch) -> (params, opt_state, metrics);
    batch keys: image0/1 [B,H,W,1], desc0/1 [B,K,128] RootSIFT,
    xy0/1 [B,K,2], scores0/1 [B,K], valid0/1 [B,K], gt_matches0 [B,K].
    """
    @partial(jax.jit)
    def step(params, opt_state, batch):
        def loss_fn(p):
            a0, m0 = net.apply(p, batch["image0"], batch["desc0"],
                               batch["xy0"], batch["scores0"],
                               batch["valid0"])
            a1, _ = net.apply(p, batch["image1"], batch["desc1"],
                              batch["xy1"], batch["scores1"],
                              batch["valid1"])
            nce = contextdesc_info_nce(a0, a1, batch["gt_matches0"],
                                       batch["valid1"])
            mbce = matchability_bce(m0, batch["gt_matches0"],
                                    batch["valid0"])
            return nce + w_match * mbce, (nce, mbce)

        (loss, (nce, mbce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "nce": nce,
                                   "match_bce": mbce}

    return step


def contextdesc_pairs_batch(rng: np.random.Generator, b: int, hw: int = 128,
                            topk: int = 128, match_radius: float = 3.0,
                            **h_kwargs) -> dict:
    """Homography SIFT pairs with GT correspondences (host side, cv2).

    Textures from data/synthetic._texture, homographies from
    training/superpoint.random_homography; GT: mutual nearest under the
    exact warp within ``match_radius`` px.
    """
    import cv2

    from ..data.synthetic import _texture
    from ..models.sift_based import sift_keypoints
    from .superpoint import random_homography

    out = {k: [] for k in ("image0", "image1", "desc0", "desc1", "xy0",
                           "xy1", "scores0", "scores1", "valid0", "valid1",
                           "gt_matches0")}
    for _ in range(b):
        tex = _texture(rng, hw, hw)
        g0 = cv2.cvtColor(tex, cv2.COLOR_RGB2GRAY)
        H = random_homography(rng, (hw, hw), **h_kwargs)
        g1 = cv2.warpPerspective(g0, H, (hw, hw), flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=0)
        xy0, s0, v0, d0 = sift_keypoints(g0, topk, with_descriptors=True)
        xy1, s1, v1, d1 = sift_keypoints(g1, topk, with_descriptors=True)

        pts = np.concatenate([xy0, np.ones((topk, 1), np.float32)], -1)
        w = (H @ pts.T).T
        w = w[:, :2] / np.where(np.abs(w[:, 2:]) > 1e-12, w[:, 2:], 1e-12)
        dist = np.linalg.norm(w[:, None] - xy1[None], axis=-1)
        dist[~v0] = 1e9
        dist[:, ~v1] = 1e9
        nn1 = dist.argmin(1)
        best = dist[np.arange(topk), nn1]
        nn0 = dist.argmin(0)
        mutual = nn0[nn1] == np.arange(topk)
        gt = np.where((best < match_radius) & mutual, nn1, -1)

        out["image0"].append(g0[..., None].astype(np.float32) / 255.0)
        out["image1"].append(g1[..., None].astype(np.float32) / 255.0)
        out["desc0"].append(d0)
        out["desc1"].append(d1)
        out["xy0"].append(xy0)
        out["xy1"].append(xy1)
        out["scores0"].append(s0)
        out["scores1"].append(s1)
        out["valid0"].append(v0)
        out["valid1"].append(v1)
        out["gt_matches0"].append(gt.astype(np.int32))
    return {k: np.stack(v) for k, v in out.items()}
