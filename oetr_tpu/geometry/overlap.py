"""Co-visible overlap-box computation via depth warping — dense & masked.

Reimplements the semantics of the reference's core geometry routine
``numpy_overlap_box`` (/root/reference/src/datasets/utils.py:140-202) as a
static-shaped, jit/vmap-friendly XLA program: instead of gathering the
variable-size set of valid-depth pixels (dynamic shapes), we keep the full
H×W grid and carry a validity mask end-to-end (SURVEY.md §7 "hard parts").

Conventions (matching the reference):
  * ``crop`` offsets are (row, col) = (y, x) of the crop inside the resized
    image; ``ratio`` is (ratio_y, ratio_x) = resized/original scale.
  * COLMAP 0.5-pixel-center convention: original-frame pixel =
    (crop_pixel + crop_offset + 0.5) / ratio.
  * Occlusion check: reprojected depth within 0.5 of target depth map
    (reference: src/datasets/utils.py:183).

Deviation from the reference (documented, not replicated): the reference's
in-bounds check compares x against the image *height* and y against the
*width* (src/datasets/utils.py:175-176) — a latent bug that is a no-op for
its square 640x640 crops. We implement the correct check (x<w, y<h).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def rigid_inverse(T: Array) -> Array:
    """Closed-form inverse of a [..., 4, 4] rigid transform (R^T, -R^T t).

    Avoids a general LU solve (jnp.linalg.inv) in the hot warp path; the
    reference inverts the pose densely (src/datasets/utils.py:163).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, (-(Rt @ t[..., None]))], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def warp_grid_via_depth(K1: Array, depth1: Array, T1: Array, crop1: Array,
                        ratio1: Array, K2: Array, T2: Array, crop2: Array,
                        ratio2: Array) -> tuple[Array, Array, Array]:
    """Warp every pixel of image1 into image2's crop frame through depth.

    Args:
      K1, K2: [3, 3] intrinsics (original-resolution frame).
      depth1: [H, W] depth map of image1's crop.
      T1, T2: [4, 4] world->camera poses.
      crop1, crop2: [2] (row, col) crop offsets in the resized images.
      ratio1, ratio2: [2] (ratio_y, ratio_x) resize ratios.

    Returns:
      (uv2, z2_est, has_depth): uv2 [H, W, 2] warped (x, y) coords in
      image2's crop frame; z2_est [H, W] predicted depth in camera2;
      has_depth [H, W] bool, True where depth1 > 0.
    """
    H, W = depth1.shape
    v1 = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)  # rows (y)
    u1 = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)  # cols (x)
    Z1 = depth1
    has_depth = Z1 > 0

    # Crop frame -> original image frame (COLMAP convention).
    x1 = (u1 + crop1[1] + 0.5) / ratio1[1]
    y1 = (v1 + crop1[0] + 0.5) / ratio1[0]
    # Back-project.
    X1 = (x1 - K1[0, 2]) * (Z1 / K1[0, 0])
    Y1 = (y1 - K1[1, 2]) * (Z1 / K1[1, 1])
    xyz1 = jnp.stack([X1, Y1, Z1], axis=-1)                   # [H, W, 3]

    T_12 = T2 @ rigid_inverse(T1)
    xyz2 = xyz1 @ T_12[:3, :3].T + T_12[:3, 3]                # [H, W, 3]
    z2 = xyz2[..., 2]

    uv2 = xyz2 @ K2.T
    uv2 = uv2[..., :2] / jnp.where(jnp.abs(uv2[..., 2:3]) > 1e-12,
                                   uv2[..., 2:3], 1e-12)
    # Original frame -> image2 crop frame.
    u2 = uv2[..., 0] * ratio2[1] - crop2[1] - 0.5
    v2 = uv2[..., 1] * ratio2[0] - crop2[0] - 0.5
    return jnp.stack([u2, v2], axis=-1), z2, has_depth


def overlap_bbox(K1: Array, depth1: Array, T1: Array, crop1: Array,
                 ratio1: Array, K2: Array, depth2: Array, T2: Array,
                 crop2: Array, ratio2: Array,
                 occlusion_thresh: float = 0.5):
    """Co-visible bounding boxes + masks for an image pair.

    Dense re-formulation of numpy_overlap_box (src/datasets/utils.py:140-202):
    same int-truncation of warped coords, same occlusion threshold, same
    box = [min_x, min_y, max_x, max_y] over surviving pixels.

    Returns:
      box1 [4], mask1 [H, W] float, box2 [4], mask2 [H2, W2] float,
      valid [] bool — all static-shaped; when no pixel survives the boxes
      are zeros and ``valid`` is False (reference: utils.py:188-195).
    """
    h2, w2 = depth2.shape
    uv2, z2_est, has_depth = warp_grid_via_depth(
        K1, depth1, T1, crop1, ratio1, K2, T2, crop2, ratio2)

    # Integer truncation like the reference's ``.astype(int)``.
    i2 = jnp.floor(uv2[..., 0]).astype(jnp.int32)  # x in image2 crop
    j2 = jnp.floor(uv2[..., 1]).astype(jnp.int32)  # y in image2 crop
    # Truncation toward zero (numpy astype) differs from floor for
    # negatives, but negatives are discarded by the bounds check anyway.
    in_bounds = (i2 >= 0) & (j2 >= 0) & (i2 < w2) & (j2 < h2)
    valid_pix = has_depth & in_bounds

    i2c = jnp.clip(i2, 0, w2 - 1)
    j2c = jnp.clip(j2, 0, h2 - 1)
    Z2 = depth2[j2c, i2c]
    not_occluded = jnp.abs(z2_est - Z2) < occlusion_thresh
    valid_pix = valid_pix & not_occluded

    any_valid = jnp.any(valid_pix)

    h1, w1 = depth1.shape
    v1 = jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 0)
    u1 = jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 1)

    big = jnp.int32(1 << 30)

    def masked_box(us, vs, m):
        x1 = jnp.min(jnp.where(m, us, big))
        y1 = jnp.min(jnp.where(m, vs, big))
        x2 = jnp.max(jnp.where(m, us, -big))
        y2 = jnp.max(jnp.where(m, vs, -big))
        return jnp.stack([x1, y1, x2, y2]).astype(jnp.float32)

    box1 = masked_box(u1, v1, valid_pix)
    box2 = masked_box(i2c, j2c, valid_pix)
    zero4 = jnp.zeros((4,), jnp.float32)
    box1 = jnp.where(any_valid, box1, zero4)
    box2 = jnp.where(any_valid, box2, zero4)

    mask1 = valid_pix.astype(jnp.float32)
    # Scatter hits of warped pixels into image2's grid (reference builds this
    # with fancy-indexing assignment, utils.py:132-137).
    mask2 = jnp.zeros((h2, w2), jnp.float32).at[j2c, i2c].max(
        valid_pix.astype(jnp.float32), mode="drop")
    return box1, mask1, box2, mask2, any_valid


def overlap_bbox_pair(K1, depth1, T1, crop1, ratio1,
                      K2, depth2, T2, crop2, ratio2,
                      occlusion_thresh: float = 0.5):
    """Symmetric GT boxes for both images of a pair.

    The reference computes box1 from image1's depth and box2 from the warp
    (and vice versa is implied by its mask2); benchmark GT uses the boxes
    from a single 1->2 warp (megadepth_pairs.py:136-200). This helper runs
    the warp both ways and returns the 1->2 result, matching the dataset's
    convention, plus the 2->1 boxes for consumers that want them.
    """
    b1, m1, b2, m2, valid = overlap_bbox(
        K1, depth1, T1, crop1, ratio1, K2, depth2, T2, crop2, ratio2,
        occlusion_thresh)
    return b1, m1, b2, m2, valid
