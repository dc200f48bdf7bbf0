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


# ---------------------------------------------------------------------------
# Descriptor training (SuperPoint paper §3.4: homography-pair hinge loss)
# ---------------------------------------------------------------------------


def cell_centers(hc: int, wc: int, stride: int = 8) -> Array:
    """[Hc*Wc, 2] full-resolution (x, y) centers of the coarse cells.

    Matches ops/nms.sample_descriptors' convention: grid coord j maps to
    pixel x = stride*j + stride/2 - 0.5 (cell (i, j) center at
    (8j + 3.5, 8i + 3.5) for stride 8).
    """
    ys = jnp.arange(hc, dtype=jnp.float32) * stride + stride / 2 - 0.5
    xs = jnp.arange(wc, dtype=jnp.float32) * stride + stride / 2 - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def descriptor_hinge_loss(desc0: Array, desc1: Array, H: Array,
                          hw: tuple[int, int], stride: int = 8,
                          pos_margin: float = 1.0, neg_margin: float = 0.2,
                          lambda_d: float = 250.0,
                          corr_radius: float = 8.0) -> Array:
    """SuperPoint descriptor loss l_d (paper eq. 4-6), batched.

    For every pair of coarse cells (one per image) related by the GT
    homography: positive pairs (warped center within ``corr_radius`` px)
    pull dot-product above ``pos_margin``; the rest push it below
    ``neg_margin``; positives weighted ``lambda_d`` to balance the
    ~(HcWc):1 negative excess. Warped centers that land outside image1
    participate only as negatives (their true match is not visible).

    Args:
      desc0, desc1: [B, Hc, Wc, D] unit-norm coarse descriptor maps.
      H: [B, 3, 3] image0 -> image1 pixel homographies.
      hw: full-resolution (H, W).
    """
    b, hc, wc, d = desc0.shape
    n = hc * wc
    centers = cell_centers(hc, wc, stride)                     # [N, 2]
    ones = jnp.ones((n, 1), jnp.float32)
    pts = jnp.concatenate([centers, ones], axis=-1)            # [N, 3]
    warped = jnp.einsum("bij,nj->bni", H, pts)                 # [B, N, 3]
    warped = warped[..., :2] / jnp.where(
        jnp.abs(warped[..., 2:]) > 1e-12, warped[..., 2:], 1e-12)
    inside = ((warped[..., 0] >= 0) & (warped[..., 0] <= hw[1] - 1)
              & (warped[..., 1] >= 0) & (warped[..., 1] <= hw[0] - 1))

    dist = jnp.linalg.norm(warped[:, :, None, :] - centers[None, None],
                           axis=-1)                            # [B, N, N]
    s = (dist <= corr_radius) & inside[..., None]

    dot = jnp.einsum("bnd,bmd->bnm", desc0.reshape(b, n, d),
                     desc1.reshape(b, n, d))
    pos = jnp.maximum(0.0, pos_margin - dot)
    neg = jnp.maximum(0.0, dot - neg_margin)
    loss = jnp.where(s, lambda_d * pos, neg)
    return jnp.sum(loss) / (b * n * n)


def random_homography(rng: np.random.Generator, hw: tuple[int, int],
                      max_rot_deg: float = 25.0,
                      scale_range: tuple[float, float] = (0.7, 1.4),
                      max_shift_frac: float = 0.15,
                      max_persp: float = 5e-4) -> np.ndarray:
    """Random rotation+scale+shift+perspective homography about center."""
    h, w = hw
    cx, cy = w / 2.0, h / 2.0
    th = np.deg2rad(rng.uniform(-max_rot_deg, max_rot_deg))
    s = rng.uniform(*scale_range)
    tx = rng.uniform(-max_shift_frac, max_shift_frac) * w
    ty = rng.uniform(-max_shift_frac, max_shift_frac) * h
    c, si = np.cos(th), np.sin(th)
    A = np.array([[s * c, -s * si, 0], [s * si, s * c, 0], [0, 0, 1.0]])
    T1 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    T2 = np.array([[1, 0, cx + tx], [0, 1, cy + ty], [0, 0, 1.0]])
    P = np.eye(3)
    P[2, 0] = rng.uniform(-max_persp, max_persp)
    P[2, 1] = rng.uniform(-max_persp, max_persp)
    return (T2 @ P @ A @ T1).astype(np.float64)


def homography_pairs_batch(rng: np.random.Generator, b: int, hw: int = 128,
                           **h_kwargs):
    """Textured homography pairs for descriptor training.

    Returns (im0 [B, hw, hw, 1] float32, im1 [B, hw, hw, 1], H [B, 3, 3])
    with im1 = warpPerspective(im0, H). Host-side (cv2 + the procedural
    texture from data/synthetic.py — the same family the synthetic
    benchmark scenes use).
    """
    import cv2

    from ..data.synthetic import _texture

    im0 = np.zeros((b, hw, hw, 1), np.float32)
    im1 = np.zeros((b, hw, hw, 1), np.float32)
    Hs = np.zeros((b, 3, 3), np.float64)
    for i in range(b):
        tex = _texture(rng, hw, hw)
        g = cv2.cvtColor(tex, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
        H = random_homography(rng, (hw, hw), **h_kwargs)
        # Constant border, NOT reflect: reflected fill duplicates im0
        # content at wrong locations, turning photometrically identical
        # patches into hinge negatives (contradictory gradients).
        g2 = cv2.warpPerspective(g, H, (hw, hw), flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=0.0)
        im0[i, :, :, 0] = g
        im1[i, :, :, 0] = g2
        Hs[i] = H
    return im0, im1, Hs


def make_superpoint_joint_train_step(net, tx, lambda_desc: float = 1.0):
    """Detector CE (synthetic shapes) + descriptor hinge (homography
    pairs) in one jit'd step — the full SuperPoint objective
    (paper eq. 1: l_p + l_p' + lambda l_d; we supervise the detector on
    the shapes stream where corners are exact, and the descriptor on the
    texture stream where the homography is exact).

    step(params, opt_state, shape_imgs, cell_labels, im0, im1, H)
      -> (params, opt_state, metrics)
    """
    @partial(jax.jit)
    def step(params, opt_state, shape_imgs, cell_labels, im0, im1, H):
        hw = im0.shape[1:3]

        def loss_fn(p):
            _, _, logits = net.apply(p, shape_imgs, with_logits=True)
            det = magicpoint_loss(logits, cell_labels)
            # One doubled batch through the encoder for both pair sides.
            _, desc = net.apply(p, jnp.concatenate([im0, im1], axis=0))
            d0, d1 = jnp.split(desc, 2, axis=0)
            des = descriptor_hinge_loss(d0, d1, H, hw)
            return det + lambda_desc * des, (det, des)

        (loss, (det, des)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "det_loss": det,
                                   "desc_loss": des}

    return step


def make_ha_labeler(net, hw: int, n_homo: int = 6, nms_radius: int = 4,
                    max_cells: int = 96, score_floor: float = 1e-3,
                    border: int = 4):
    """Homographic-adaptation pseudo-labels on arbitrary images.

    SuperPoint paper §5 (MagicPoint -> SuperPoint domain transfer): the
    detector trained on synthetic shapes is run over ``n_homo`` random
    homographic views of each target-domain image, the score maps are
    unwarped and averaged, and stable peaks become pseudo-corner cell
    labels for further detector CE ON THE TARGET DOMAIN. Round-4
    motivation: the shapes-only detector measured 0.21 repeatability@3px
    on texture scenes (it never saw one), starving the matcher stack of
    repeatable keypoints.

    Returns jitted ``label_fn(params, images [B,hw,hw,1], rng) ->
    cell labels [B, hw/8, hw/8] int32`` (65-way; 64 = dustbin).
    """
    from ..data.device_synth import (_bilinear, random_homography_device,
                                     warp_gray)
    from ..ops.nms import remove_borders, simple_nms

    u = jnp.arange(hw, dtype=jnp.float32)

    def label_fn(params, images, rng):
        b = images.shape[0]

        def scores_of(img):
            s, _ = net.apply(params, img)
            return s

        acc = scores_of(images).astype(jnp.float32)
        cnt = jnp.ones_like(acc, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(u, u, indexing="xy")

        def body(carry, key):
            acc, cnt = carry
            ks = jax.random.split(key, b)
            Hs = jax.vmap(lambda k: random_homography_device(
                k, hw, 20.0, (0.7, 1.4), 0.1))(ks)
            warped, _ = jax.vmap(lambda g, H: warp_gray(g, H, hw))(
                images, Hs)
            s = scores_of(warped)

            def unwarp(sb, H):
                pts = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)
                dst = pts @ H.T
                dx = dst[..., 0] / dst[..., 2]
                dy = dst[..., 1] / dst[..., 2]
                ok = (dx >= 0) & (dx <= hw - 1) & (dy >= 0) & (dy <= hw - 1)
                val = _bilinear(sb[..., None], dx, dy)[..., 0]
                return jnp.where(ok, val, 0.0), ok.astype(sb.dtype)

            sv, ok = jax.vmap(unwarp)(s, Hs)
            return ((acc + sv).astype(jnp.float32),
                    (cnt + ok).astype(jnp.float32)), None

        (acc, cnt), _ = jax.lax.scan(body, (acc, cnt),
                                     jax.random.split(rng, n_homo))
        mean = acc / jnp.maximum(cnt, 1.0)
        nmsed = remove_borders(simple_nms(mean, nms_radius), border)

        # Per-cell argmax -> 65-way labels (deterministic, no scatter).
        # Threshold is per-image adaptive: a fixed cutoff on the
        # homography-AVERAGED map starves labels (averaging dilutes
        # peaks ~n_homo-fold and the shapes-trained detector scores
        # textures low to begin with — 1-9 labeled cells/256 measured
        # at 0.012); instead keep the top ``max_cells`` cells per image
        # above a small absolute floor.
        hc = hw // 8
        cells = nmsed.reshape(b, hc, 8, hc, 8).transpose(0, 1, 3, 2, 4)
        cells = cells.reshape(b, hc, hc, 64)
        cmax = jnp.max(cells, -1)                              # [B,hc,hc]
        kth = jax.lax.top_k(cmax.reshape(b, -1),
                            max_cells)[0][:, -1]               # [B]
        thr = jnp.maximum(kth, score_floor)[:, None, None]
        labels = jnp.where(cmax >= thr, jnp.argmax(cells, -1),
                           64).astype(jnp.int32)
        return jax.lax.stop_gradient(labels)

    return jax.jit(label_fn)


def make_corner_labeler(hw: int, nms_radius: int = 4, max_cells: int = 64,
                        quality: float = 0.01, border: int = 4,
                        sigma: float = 1.5):
    """Shi-Tomasi corner-teacher pseudo-labels (round 5).

    Homographic adaptation (make_ha_labeler) bootstraps labels from the
    CURRENT detector — measured in round 5 to leave texture
    repeatability unchanged (0.266@3px): the shapes-trained detector has
    no texture response for the homography averaging to stabilize, so
    the forced per-image label budget distills noise. This labeler uses
    a STATIC classical teacher instead: the minimum eigenvalue of the
    gradient structure tensor (Shi-Tomasi 1994, cv2.goodFeaturesToTrack
    semantics — relative quality gate + spatial NMS), whose own
    repeatability@3px on the target scene stream measures 0.74 —
    *above* SIFT's 0.68 — giving the detector a domain-matched,
    repeatable target. Same 65-way cell-label output as the HA labeler,
    so make_superpoint_joint_ha_train_step consumes it unchanged.

    Returns jitted ``label_fn(images [B,hw,hw,1]) -> [B,hw/8,hw/8]``.
    """
    from ..ops.nms import remove_borders, simple_nms

    # 3x3 Sobel and a separable Gaussian window, as fixed weights.
    sob = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8
    r = max(1, int(round(2 * sigma)))
    g1 = jnp.exp(-0.5 * (jnp.arange(-r, r + 1, dtype=jnp.float32)
                         / sigma) ** 2)
    g1 = g1 / jnp.sum(g1)

    def conv2(x, k):
        # x: [B, H, W]; k: [kh, kw] -> SAME conv.
        return jax.lax.conv_general_dilated(
            x[:, None], k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

    def label_fn(images):
        b = images.shape[0]
        g = images[..., 0].astype(jnp.float32)
        ix = conv2(g, sob)
        iy = conv2(g, sob.T)

        def smooth(x):
            x = conv2(x, g1[None, :])
            return conv2(x, g1[:, None])

        a = smooth(ix * ix)
        c = smooth(iy * iy)
        bb = smooth(ix * iy)
        # min eigenvalue of [[a, bb], [bb, c]]
        resp = (a + c) / 2 - jnp.sqrt(((a - c) / 2) ** 2 + bb ** 2 + 1e-12)
        nmsed = remove_borders(simple_nms(resp, nms_radius), border)

        hc = hw // 8
        cells = nmsed.reshape(b, hc, 8, hc, 8).transpose(0, 1, 3, 2, 4)
        cells = cells.reshape(b, hc, hc, 64)
        cmax = jnp.max(cells, -1)
        # cv2.goodFeaturesToTrack's relative quality gate + a top-K cap.
        floor = quality * jnp.max(cmax.reshape(b, -1), -1)[:, None, None]
        kth = jax.lax.top_k(cmax.reshape(b, -1),
                            max_cells)[0][:, -1][:, None, None]
        thr = jnp.maximum(kth, floor)
        labels = jnp.where((cmax >= thr) & (cmax > 0),
                           jnp.argmax(cells, -1), 64).astype(jnp.int32)
        return jax.lax.stop_gradient(labels)

    return jax.jit(label_fn)


def make_superpoint_joint_ha_train_step(net, tx, lambda_desc: float = 1.0,
                                        lambda_ha: float = 1.0):
    """Joint step + homographic-adaptation detector CE on the texture
    stream (labels from make_ha_labeler; zero ha weight per-batch is
    expressed by passing ha_w=0 so the warmup phase shares the
    executable).

    step(params, opt, shape_imgs, labels, im0, im1, H, ha_labels, ha_w)
    — ``im0`` doubles as the HA image batch (it is a fresh texture).
    """
    @partial(jax.jit)
    def step(params, opt_state, shape_imgs, cell_labels, im0, im1, H,
             ha_labels, ha_w):
        hw = im0.shape[1:3]

        def loss_fn(p):
            _, _, logits = net.apply(p, shape_imgs, with_logits=True)
            det = magicpoint_loss(logits, cell_labels)
            _, desc0, logits0 = net.apply(p, im0, with_logits=True)
            _, desc1 = net.apply(p, im1)
            des = descriptor_hinge_loss(desc0, desc1, H, hw)
            ha = magicpoint_loss(logits0, ha_labels)
            return (det + lambda_desc * des + lambda_ha * ha_w * ha,
                    (det, des, ha))

        (loss, (det, des, ha)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "det_loss": det,
                                   "desc_loss": des, "ha_loss": ha}

    return step
