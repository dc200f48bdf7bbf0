"""Box algebra vs reference numerics (src/models/utils.py, src/losses/utils.py)."""
import jax.numpy as jnp
import numpy as np

from oetr_tpu.geometry import (bbox_overlaps_aligned, bbox_overlaps_pairwise,
                               bbox_oiou, box_cxywh_to_xyxy, box_tlbr_to_xyxy,
                               box_xywh_to_xyxy, box_xyxy_to_cxywh, giou_loss,
                               iou_loss, mesh_grid_centers, oiou_loss,
                               pair_overlap_loss)


def test_bbox_overlaps_pairwise_golden():
    # Golden values from the reference docstring (src/losses/utils.py:30-44).
    b1 = jnp.array([[0, 0, 10, 10], [10, 10, 20, 20], [32, 32, 38, 42]],
                   jnp.float32)
    b2 = jnp.array([[0, 0, 10, 20], [0, 10, 10, 19], [10, 10, 20, 20]],
                   jnp.float32)
    ious = bbox_overlaps_pairwise(b1, b2)
    expected = np.array([[0.5, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ious), expected, atol=1e-6)


def test_bbox_overlaps_aligned_matches_pairwise_diag():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 50, (16, 2, 2))
    boxes = np.concatenate([pts.min(1), pts.max(1)], axis=-1).astype(np.float32)
    pts2 = rng.uniform(0, 50, (16, 2, 2))
    boxes2 = np.concatenate([pts2.min(1), pts2.max(1)], axis=-1).astype(np.float32)
    aligned = bbox_overlaps_aligned(jnp.asarray(boxes), jnp.asarray(boxes2))
    pairwise = bbox_overlaps_pairwise(jnp.asarray(boxes), jnp.asarray(boxes2))
    np.testing.assert_allclose(np.asarray(aligned),
                               np.asarray(jnp.diagonal(pairwise)), atol=1e-6)


def test_box_roundtrips():
    rng = np.random.default_rng(1)
    xy1 = rng.uniform(0, 300, (32, 2))
    wh = rng.uniform(1, 200, (32, 2))
    xyxy = np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)
    xyxy = np.clip(xyxy, 0, 640)
    cxywh = box_xyxy_to_cxywh(jnp.asarray(xyxy), 640, 640)
    back = box_cxywh_to_xyxy(cxywh, 640, 640)
    np.testing.assert_allclose(np.asarray(back), xyxy, atol=1e-4)

    xywh = np.concatenate([xy1, wh], axis=-1).astype(np.float32)
    out = box_xywh_to_xyxy(jnp.asarray(xywh))
    np.testing.assert_allclose(np.asarray(out),
                               np.concatenate([xy1, xy1 + wh], -1), atol=1e-5)


def test_box_tlbr_to_xyxy_clamps():
    loc = jnp.array([[100.0, 200.0]])
    tlbr = jnp.array([[0.5, 0.5, 0.5, 0.5]])  # t,l,b,r normalized
    out = box_tlbr_to_xyxy(loc, tlbr, max_h=480, max_w=640)
    # t*480=240 above y=200 -> clamp 0; l*640=320 left of x=100 -> clamp 0.
    np.testing.assert_allclose(np.asarray(out[0]),
                               [0.0, 0.0, 100 + 320, 200 + 240], atol=1e-4)


def test_oiou_asymmetric():
    target = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    pred = jnp.array([[0.0, 0.0, 20.0, 20.0]])  # covers target fully
    oiou = bbox_oiou(target, pred)
    np.testing.assert_allclose(np.asarray(oiou), [1.0], atol=1e-6)
    # Reversed: intersection(10x10)/target-area(400) = 0.25
    oiou_r = bbox_oiou(pred, target)
    np.testing.assert_allclose(np.asarray(oiou_r), [0.25], atol=1e-6)


def test_losses_sanity():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    np.testing.assert_allclose(np.asarray(iou_loss(b, b)), [0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(giou_loss(b, b)), [0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(oiou_loss(b, b)), [0.0], atol=1e-5)
    far = jnp.array([[100.0, 100.0, 110.0, 110.0]])
    # Disjoint boxes: GIoU in (1, 2]; pair loss averages both directions.
    g = np.asarray(giou_loss(b, far))
    assert 1.0 < g[0] <= 2.0
    pl = np.asarray(pair_overlap_loss(b, b, far, far))
    np.testing.assert_allclose(pl, [0.0], atol=1e-5)


def test_giou_known_value():
    # Boxes [0,0,2,2] and [1,1,3,3]: inter=1, union=7, iou=1/7,
    # enclosing=9 -> giou = 1/7 - 2/9; loss = 1 - giou.
    p = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    t = jnp.array([[1.0, 1.0, 3.0, 3.0]])
    expected = 1.0 - (1.0 / 7.0 - 2.0 / 9.0)
    np.testing.assert_allclose(np.asarray(giou_loss(p, t)), [expected], atol=1e-5)


def test_mesh_grid_centers():
    # OETR soft-argmax coordinate map: (idx + 0.5) * stride (src/model.py:103-107).
    grid = mesh_grid_centers(2, 3, 32.0, 32.0)
    assert grid.shape == (6, 2)
    np.testing.assert_allclose(np.asarray(grid[0]), [16.0, 16.0])
    np.testing.assert_allclose(np.asarray(grid[1]), [48.0, 16.0])  # x fastest
    np.testing.assert_allclose(np.asarray(grid[3]), [16.0, 48.0])


def test_delta2bbox_identity_and_shift():
    from oetr_tpu.geometry import delta2bbox
    rois = jnp.array([[10.0, 10.0, 30.0, 50.0]])
    # Zero deltas: box unchanged.
    out = delta2bbox(rois, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rois), atol=1e-5)
    # dx = 1 shifts center by one box width (20px).
    out = delta2bbox(rois, jnp.array([[1.0, 0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out[0]), [30.0, 10.0, 50.0, 50.0],
                               atol=1e-4)
    # log-scale growth: dw = log 2 doubles the width.
    out = delta2bbox(rois, jnp.array([[0.0, 0.0, float(np.log(2.0)), 0.0]]))
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 10.0, 40.0, 50.0],
                               atol=1e-3)
    # Clamped to max_shape.
    out = delta2bbox(rois, jnp.zeros((1, 4)), max_shape=(40, 25))
    np.testing.assert_allclose(np.asarray(out[0]), [10.0, 10.0, 24.0, 39.0],
                               atol=1e-5)


def test_mask2bbox():
    from oetr_tpu.geometry import mask2bbox
    m = np.zeros((2, 8, 10), bool)
    m[0, 2:5, 3:7] = True          # y 2..4, x 3..6
    box = np.asarray(mask2bbox(jnp.asarray(m)))
    np.testing.assert_allclose(box[0], [3, 2, 6, 4])
    np.testing.assert_allclose(box[1], [0, 0, 0, 0])  # empty mask
