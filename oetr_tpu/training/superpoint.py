"""SuperPoint detector training: MagicPoint-style synthetic supervision.

The first stage of the SuperPoint paper's recipe (the reference only
wraps a downloaded checkpoint, dloc/core/extractors/superpoint.py:22-45):
train the 65-way cell classifier on synthetic shapes whose corner
locations are known exactly. Homographic adaptation (stage 2) reuses
the same loss on warped real images with pseudo-labels.

Cell labels [B, H/8, W/8] take values 0..63 (the corner's position
inside its 8x8 cell, row-major) or 64 (the "no keypoint" dustbin) —
exactly the detector head's softmax layout (models/superpoint.py:64-71).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray


def corners_to_cell_labels(corners: np.ndarray, hw: tuple[int, int],
                           n_corners: np.ndarray | None = None) -> np.ndarray:
    """GT corner pixels -> [B, H/8, W/8] cell-label tensor.

    corners: [B, K, 2] (x, y) float (padded rows anywhere outside the
    image or beyond n_corners are ignored). On collisions inside one
    cell the last corner wins (matches the paper's rasterization).
    """
    b, k = corners.shape[:2]
    h, w = hw
    labels = np.full((b, h // 8, w // 8), 64, np.int32)
    for i in range(b):
        kk = k if n_corners is None else int(n_corners[i])
        for x, y in corners[i][:kk]:
            xi, yi = int(round(x)), int(round(y))
            if 0 <= xi < w and 0 <= yi < h:
                labels[i, yi // 8, xi // 8] = (yi % 8) * 8 + (xi % 8)
    return labels


def magicpoint_loss(logits: Array, cell_labels: Array) -> Array:
    """Mean 65-way cross-entropy over cells (SuperPoint eq. 2 l_p)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, cell_labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def make_superpoint_train_step(net, tx):
    """jit'd (params, opt_state, images, cell_labels) -> (..., metrics).

    ``net`` is a SuperPointNet (the raw backbone, not the fixed-k
    extractor wrapper).
    """
    @partial(jax.jit)
    def step(params, opt_state, images, cell_labels):
        def loss_fn(p):
            _, _, logits = net.apply(p, images, with_logits=True)
            return magicpoint_loss(logits, cell_labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return step


def synthetic_shapes_batch(rng: np.random.Generator, b: int, hw: int = 96,
                           max_corners: int = 24):
    """Render random quads/triangles/lines; return (images, corners, n).

    images [B, hw, hw, 1] float32 in [0, 1]; corners [B, K, 2] (x, y)
    padded with -1; n [B] corner counts. Needs cv2 (host side).
    """
    import cv2

    images = np.zeros((b, hw, hw, 1), np.float32)
    corners = np.full((b, max_corners, 2), -1.0, np.float32)
    counts = np.zeros(b, np.int32)
    for i in range(b):
        img = np.full((hw, hw), rng.uniform(0.0, 0.3), np.float32)
        pts_all = []
        for _ in range(int(rng.integers(2, 5))):
            n_v = int(rng.integers(3, 5))
            pts = rng.uniform(8, hw - 8, (n_v, 2)).astype(np.float32)
            hull = cv2.convexHull(pts.astype(np.float32))[:, 0, :]
            shade = float(rng.uniform(0.5, 1.0))
            cv2.fillPoly(img, [np.round(hull).astype(np.int32)], shade)
            pts_all += [tuple(p) for p in np.round(hull)]
        pts_all = pts_all[:max_corners]
        counts[i] = len(pts_all)
        for j, p in enumerate(pts_all):
            corners[i, j] = p
        images[i, :, :, 0] = img
    return images, corners, counts
