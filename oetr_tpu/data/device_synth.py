"""On-device (jit/vmap) synthetic pair generator — infinite training data.

Round-3 post-mortem: every controlled OETR training run hedged on hard
scale pairs, and the round-4 probe localized WHY — token retrieval
accuracy is 100% on the 512 fixed training pairs but 21% on held-out
pairs. The model memorizes a small disk-generated dataset (the CPU
generator, data/synthetic.py, costs ~1-2 s/pair — data-starved by 3
orders of magnitude vs the reference's 128k MegaDepth pairs/epoch,
/root/reference/configs/baseline/oetr_config.py:19).

This module is the TPU-native answer: the full pair synthesis —
procedural texture, camera motion, bilinear rendering, GT overlap boxes
through the real geometry path — expressed in jnp, vmapped over the
batch and fused into one XLA program. Every training step sees a fresh,
never-repeated batch, generated on the accelerator itself (no host
loop, no H2D transfer, no memorizable dataset).

Distribution parity: textures and camera models mirror
data/synthetic.generate_scene (waves + blobs + sharp rects + blurred
noise; lateral-translation and dolly-in regimes with the same pose
convention and the same (pp+0.5)*(1-1/s) sub-pixel offset math), so
disk-generated val sets from previous rounds remain the measuring
stick.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.overlap import overlap_bbox_pair

Array = jnp.ndarray


def _texture(rng: jax.Array, h: int, w: int) -> Array:
    """Procedural RGB texture in [0, 1], shape [h, w, 3].

    jnp re-expression of data/synthetic._texture: 6 low-frequency color
    waves + 25 Gaussian blobs + 80 sharp-edged alpha-blended rectangles
    (corners for classical detectors) + band-limited noise.
    """
    k_wave, k_blob, k_rect, k_noise = jax.random.split(rng, 4)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    # --- 6 color waves, summed via one broadcast ------------------------
    kw = jax.random.split(k_wave, 3)
    f = jax.random.uniform(kw[0], (6, 2), minval=0.01, maxval=0.08)
    ph = jax.random.uniform(kw[1], (6,), maxval=2 * jnp.pi)
    cw = jax.random.uniform(kw[2], (6, 3))
    phase = (f[:, 0, None, None] * xx[None] + f[:, 1, None, None] * yy[None]
             + ph[:, None, None])                        # [6, h, w]
    img = jnp.einsum("khw,kc->hwc", jnp.sin(phase), cw)

    # --- 25 Gaussian blobs ---------------------------------------------
    kb = jax.random.split(k_blob, 4)
    cy = jax.random.uniform(kb[0], (25,), maxval=float(h))
    cx = jax.random.uniform(kb[1], (25,), maxval=float(w))
    s = jax.random.uniform(kb[2], (25,), minval=2.0, maxval=12.0)
    cb = jax.random.uniform(kb[3], (25, 3), minval=-1.0, maxval=1.0)
    g = jnp.exp(-((yy[None] - cy[:, None, None]) ** 2
                  + (xx[None] - cx[:, None, None]) ** 2)
                / (2.0 * s[:, None, None] ** 2))          # [25, h, w]
    img = img + jnp.einsum("khw,kc->hwc", g, cb)

    img = img - jnp.min(img)
    img = img / jnp.maximum(jnp.max(img), 1e-6)

    # --- 80 sharp rectangles (order-dependent -> lax.scan) --------------
    kr = jax.random.split(k_rect, 5)
    ry = jax.random.uniform(kr[0], (80,), maxval=float(h - 4))
    rx = jax.random.uniform(kr[1], (80,), maxval=float(w - 4))
    rh = jax.random.uniform(kr[2], (80,), minval=3.0, maxval=18.0)
    rw = jax.random.uniform(kr[3], (80,), minval=3.0, maxval=18.0)
    rca = jax.random.uniform(kr[4], (80, 4))              # rgb + alpha seed
    rc = rca[:, :3]
    ra = 0.4 + 0.5 * rca[:, 3]

    def paint(im, rect):
        y0, x0, hh, ww, c, a = rect
        mask = ((yy >= y0) & (yy < y0 + hh)
                & (xx >= x0) & (xx < x0 + ww))[..., None]
        return jnp.where(mask, (1 - a) * im + a * c[None, None], im), None

    img, _ = jax.lax.scan(paint, img, (ry, rx, rh, rw, rc, ra))

    # --- band-limited noise (separable Gaussian blur, sigma 1.2) --------
    t = jnp.arange(-4, 5, dtype=jnp.float32)
    kern = jnp.exp(-t * t / (2 * 1.2 * 1.2))
    kern = kern / jnp.sum(kern)
    noise = jax.random.normal(k_noise, (h, w))
    blur_h = jax.vmap(lambda row: jnp.convolve(row, kern, mode="same"))
    noise = blur_h(noise)             # along w
    noise = blur_h(noise.T).T         # along h
    img = jnp.clip(img + 0.08 * noise[..., None], 0.0, 1.0)
    # 8-bit quantization parity with the disk pipeline's uint8 round-trip.
    return jnp.round(img * 255.0) / 255.0


def _bilinear(canvas: Array, x: Array, y: Array) -> Array:
    """Sample [H, W, 3] canvas at float coords (x, y) -> [..., 3]."""
    h, w = canvas.shape[:2]
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    xi0, yi0, xi1, yi1 = (v.astype(jnp.int32) for v in (x0, y0, x1, y1))
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    c00 = canvas[yi0, xi0]
    c01 = canvas[yi0, xi1]
    c10 = canvas[yi1, xi0]
    c11 = canvas[yi1, xi1]
    return ((1 - wy) * ((1 - wx) * c00 + wx * c01)
            + wy * ((1 - wx) * c10 + wx * c11))


def _synthesize_one(rng: jax.Array, hw: int, pad: int, depth_z: float,
                    focal: float, scale_range: tuple[float, float],
                    p_translate: float, illum_jitter: float) -> dict:
    """One pair + GT geometry (unbatched; vmapped by the generator)."""
    k_tex, k_mode, k_scale, k_off, k_illum = jax.random.split(rng, 5)
    C = hw + 2 * pad
    canvas = _texture(k_tex, C, C)
    im1 = canvas[pad:pad + hw, pad:pad + hw]

    pp = hw / 2.0
    s_dolly = jax.random.uniform(k_scale, (), minval=scale_range[0],
                                 maxval=scale_range[1])
    translate = jax.random.uniform(k_mode, ()) < p_translate
    s = jnp.where(translate, 1.0, jnp.maximum(s_dolly, 1.0))

    # Offset of image2's footprint in image1's frame (continuous px).
    off01 = jax.random.uniform(k_off, (2,))               # (ox, oy) seeds
    off_translate = (off01 * 2.0 - 1.0) * pad             # [-pad, pad]
    off_dolly = off01 * (hw - hw / s)                     # [0, hw - hw/s]
    ox, oy = jnp.where(translate, off_translate, off_dolly)

    # Render image2 by bilinear sampling: u1 = o + (u2 + 0.5)/s - 0.5
    # (cv2.resize's sampling convention — data/synthetic.py:109-133).
    u2 = jnp.arange(hw, dtype=jnp.float32)
    gx = pad + ox + (u2[None, :] + 0.5) / s - 0.5         # [1, hw]
    gy = pad + oy + (u2[:, None] + 0.5) / s - 0.5         # [hw, 1]
    im2 = _bilinear(canvas, jnp.broadcast_to(gx, (hw, hw)),
                    jnp.broadcast_to(gy, (hw, hw)))
    gain = 1.0 + illum_jitter * (2.0 * jax.random.uniform(k_illum, ()) - 1.0)
    im2 = jnp.clip(im2 * gain, 0.0, 1.0)

    # Camera 2 center: c = z/f * (o - (pp+0.5)*(1 - 1/s)), tz = z*(1-1/s)
    # — identical sub-pixel-consistent GT math as the disk generator.
    shrink = 1.0 - 1.0 / s
    tz = depth_z * shrink
    cam2 = jnp.stack([depth_z / focal * (ox - (pp + 0.5) * shrink),
                      depth_z / focal * (oy - (pp + 0.5) * shrink), tz])
    pose1 = jnp.eye(4, dtype=jnp.float32)
    pose2 = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-cam2)

    K = jnp.array([[focal, 0.0, pp], [0.0, focal, pp], [0.0, 0.0, 1.0]],
                  jnp.float32)
    depth1 = jnp.full((hw, hw), depth_z, jnp.float32)
    depth2 = jnp.full((hw, hw), depth_z - tz, jnp.float32)
    crop = jnp.zeros((2,), jnp.float32)
    ratio = jnp.ones((2,), jnp.float32)

    # GT overlap boxes through the real geometry path (same code that
    # builds GT for the disk datasets: geometry/overlap.py).
    box1, _, box2, _, valid = overlap_bbox_pair(
        K, depth1, pose1, crop, ratio, K, depth2, pose2, crop, ratio)

    return {
        "image1": im1, "image2": im2,
        "overlap_box1": box1, "overlap_box2": box2, "overlap_valid": valid,
        "K1": K, "K2": K, "depth1": depth1, "depth2": depth2,
        "pose1": pose1, "pose2": pose2, "crop1": crop, "crop2": crop,
        "ratio1": ratio, "ratio2": ratio,
        "scale": s,
    }


def random_homography_device(rng: jax.Array, hw: int,
                             max_rot_deg: float = 25.0,
                             scale_range: tuple[float, float] = (0.55, 1.8),
                             max_shift_frac: float = 0.15,
                             max_persp: float = 5e-4) -> Array:
    """Random center-anchored rotation+scale+shift+perspective homography
    (training/superpoint.random_homography semantics), on device."""
    k_rot, k_scale, k_shift, k_persp = jax.random.split(rng, 4)
    th = jnp.deg2rad(jax.random.uniform(
        k_rot, (), minval=-max_rot_deg, maxval=max_rot_deg))
    s = jax.random.uniform(k_scale, (), minval=scale_range[0],
                           maxval=scale_range[1])
    tsh = jax.random.uniform(k_shift, (2,), minval=-max_shift_frac,
                             maxval=max_shift_frac) * hw
    persp = jax.random.uniform(k_persp, (2,), minval=-max_persp,
                               maxval=max_persp)
    c, si = jnp.cos(th), jnp.sin(th)
    cx = cy = hw / 2.0
    A = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    A = A.at[0, 0].set(s * c).at[0, 1].set(-s * si)
    A = A.at[1, 0].set(s * si).at[1, 1].set(s * c)
    T1 = jnp.array([[1.0, 0, -cx], [0, 1.0, -cy], [0, 0, 1.0]])
    T2 = jnp.array([[1.0, 0, cx], [0, 1.0, cy], [0, 0, 1.0]])
    T2 = T2.at[0, 2].add(tsh[0]).at[1, 2].add(tsh[1])
    P = jnp.eye(3).at[2, 0].set(persp[0]).at[2, 1].set(persp[1])
    return T2 @ P @ A @ T1


def warp_gray(g: Array, H: Array, hw: int):
    """Inverse-warp a [hw, hw] (or [hw, hw, 1]) grayscale image by H.

    im1(x) = g(H^-1 x) with zero border (cv2.warpPerspective parity).
    Returns (im1 [hw, hw, 1], inside [hw, hw] bool).
    """
    if g.ndim == 3:
        g = g[..., 0]
    Hi = jnp.linalg.inv(H)
    u = jnp.arange(hw, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(u, u, indexing="xy")
    pts = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)      # [hw,hw,3]
    src = pts @ Hi.T
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]
    inside = (sx >= 0) & (sx <= hw - 1) & (sy >= 0) & (sy <= hw - 1)
    warped = _bilinear(g[..., None], sx, sy)[..., 0]
    return jnp.where(inside, warped, 0.0)[..., None], inside


def make_homography_pair_generator(hw: int, batch_size: int,
                                   max_rot_deg: float = 25.0,
                                   scale_range: tuple[float, float] = (0.55,
                                                                       1.8),
                                   max_shift_frac: float = 0.15,
                                   max_persp: float = 5e-4):
    """Grayscale texture homography pairs, generated on device.

    The SuperPoint descriptor stream (training/superpoint.py:
    homography_pairs_batch) ran on the host: ~1-2 s of cv2 texture+warp
    per batch vs a ~30 ms TPU train step — the data loop was the
    bottleneck AND drew from a small fixed texture pool (memorizable).
    This produces the same distribution fully on device: fresh texture
    per sample, random rotation+scale+shift+perspective homography about
    the center (training/superpoint.random_homography semantics),
    inverse-warp bilinear render with zero border (cv2.warpPerspective
    parity).

    Returns jitted ``gen(rng) -> (im0 [B,hw,hw,1], im1 [B,hw,hw,1],
    H [B,3,3])`` with im1 = warp(im0, H).
    """
    def one(rng):
        k_tex, k_h = jax.random.split(rng)
        tex = _texture(k_tex, hw, hw)
        g = (0.299 * tex[..., 0] + 0.587 * tex[..., 1]
             + 0.114 * tex[..., 2])
        H = random_homography_device(k_h, hw, max_rot_deg, scale_range,
                                     max_shift_frac, max_persp)
        im1, _ = warp_gray(g, H, hw)
        return g[..., None], im1, H

    @jax.jit
    def gen(rng: jax.Array):
        im0, im1, H = jax.vmap(one)(jax.random.split(rng, batch_size))
        return im0, im1, H

    return gen


def make_device_generator(hw: int, batch_size: int,
                          scale_range: tuple[float, float] = (1.25, 3.2),
                          p_translate: float = 0.25,
                          max_shift_px: int = 48, depth_z: float = 10.0,
                          focal: float = 120.0,
                          illum_jitter: float = 0.0):
    """Build ``gen(rng) -> batch`` producing fresh on-device batches.

    The returned function is jitted; each call costs a fraction of one
    train step and yields a batch dict with exactly the keys
    training.train.loss_fn consumes (images, GT boxes, validity, and the
    geometry set for the aux InfoNCE / cycle losses), plus a ``scale``
    key [B] for per-difficulty loss weighting.
    """
    fn = partial(_synthesize_one, hw=hw, pad=max_shift_px, depth_z=depth_z,
                 focal=focal, scale_range=scale_range,
                 p_translate=p_translate, illum_jitter=illum_jitter)

    @jax.jit
    def gen(rng: jax.Array) -> dict:
        return jax.vmap(fn)(jax.random.split(rng, batch_size))

    return gen
