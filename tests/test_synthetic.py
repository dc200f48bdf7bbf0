"""Synthetic scene generator: GT overlap boxes are the exact shift
intersection when the data layer recomputes them online."""
import numpy as np
import pytest


@pytest.mark.quick
def test_generate_scene_gt_boxes(tmp_path):
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene

    hw = 96
    pairs = generate_scene(str(tmp_path), n_pairs=4, image_hw=hw,
                           max_shift_px=24, seed=7)
    ds = MegaDepthPairsDataset(str(tmp_path), pairs, image_size=(hw, hw),
                               train=False)
    assert len(ds) == 4
    for i in range(4):
        item = ds[i]
        assert item["overlap_valid"]
        b1 = item["overlap_box1"]
        b2 = item["overlap_box2"]
        # Pure-translation constant-depth pair: the two boxes are the
        # same size (the intersection rectangle seen from both sides).
        np.testing.assert_allclose(b1[2] - b1[0], b2[2] - b2[0], atol=2.0)
        np.testing.assert_allclose(b1[3] - b1[1], b2[3] - b2[1], atol=2.0)
        # and smaller than the frame whenever the shift is nonzero.
        assert 0 <= b1[0] <= b1[2] <= hw
        assert 0 <= b1[1] <= b1[3] <= hw
        # Photometric consistency: the overlap crops match pixel-wise.
        x1, y1 = int(round(b1[0])), int(round(b1[1]))
        x2, y2 = int(round(b2[0])), int(round(b2[1]))
        w = int(min(b1[2] - b1[0], b2[2] - b2[0])) - 2
        h = int(min(b1[3] - b1[1], b2[3] - b2[1])) - 2
        c1 = item["image1"][y1 + 1:y1 + 1 + h, x1 + 1:x1 + 1 + w]
        c2 = item["image2"][y2 + 1:y2 + 1 + h, x2 + 1:x2 + 1 + w]
        assert np.mean(np.abs(c1 - c2)) < 0.03   # jpeg noise only


@pytest.mark.quick
def test_generate_scene_scale_diff_gt_boxes(tmp_path):
    """Dolly-in pairs (scale_range > 1): GT box1 is the magnified
    sub-region, GT box2 is (nearly) the full frame, and the scale ratio
    between box sizes matches the commanded magnification."""
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene

    hw = 128
    pairs = generate_scene(str(tmp_path), n_pairs=4, image_hw=hw, seed=3,
                           scale_range=(2.0, 3.0))
    ds = MegaDepthPairsDataset(str(tmp_path), pairs, image_size=(hw, hw),
                               train=False)
    for i in range(4):
        item = ds[i]
        assert item["overlap_valid"]
        b1 = item["overlap_box1"]
        b2 = item["overlap_box2"]
        w1, h1 = b1[2] - b1[0], b1[3] - b1[1]
        w2, h2 = b2[2] - b2[0], b2[3] - b2[1]
        # box2 covers (nearly) the whole magnified frame...
        assert w2 > 0.95 * hw and h2 > 0.95 * hw
        # ...box1 is the sub-region, scale in the commanded range.
        s = (w2 / w1 + h2 / h1) / 2
        assert 1.8 < s < 3.3, s
        # Photometric consistency at equalized resolution: upsampling
        # image1's box to image2's box reproduces image2's content.
        import cv2
        x1, y1 = int(round(b1[0])), int(round(b1[1]))
        ww, hh = int(w1) - 2, int(h1) - 2
        crop1 = item["image1"][y1 + 1:y1 + 1 + hh, x1 + 1:x1 + 1 + ww]
        up = cv2.resize(crop1, (hw, hw), interpolation=cv2.INTER_LINEAR)
        err = np.mean(np.abs(up - item["image2"]))
        assert err < 0.12, err   # jpeg + double-resample noise only


def test_generate_scene_3d_geometry(tmp_path):
    """Ray-cast 3-D scenes: depth/pose GT is sub-pixel consistent with
    the rendered pixels (photometric check through the epipolar warp),
    depth maps are multi-valued (real parallax), and the online GT
    overlap-box path accepts the pair."""
    import cv2
    import h5py
    import os

    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.pairs import load_pairs
    from oetr_tpu.data.synthetic import generate_scene_3d

    hw = 160
    pairs = generate_scene_3d(str(tmp_path), n_pairs=2, image_hw=hw,
                              seed=3, scale_range=(1.1, 1.5),
                              rot_deg=10.0, tilt_deg=6.0,
                              illum_range=(0.85, 1.15))
    recs = load_pairs(pairs)
    assert len(recs) == 2
    r = recs[0]
    im1 = cv2.imread(os.path.join(tmp_path, r.image_path1))[..., ::-1]
    im2 = cv2.imread(os.path.join(tmp_path, r.image_path2))[..., ::-1]
    with h5py.File(os.path.join(tmp_path, r.depth_path1)) as f:
        d1 = f["/depth"][()]
    with h5py.File(os.path.join(tmp_path, r.depth_path2)) as f:
        d2 = f["/depth"][()]
    # Multi-plane: depth takes at least two distinct values.
    assert np.unique(np.round(d1[d1 > 0], 2)).size > 1

    # Warp image1 pixels through depth+pose into image2; on non-occluded
    # correspondences the gray values must correlate strongly (up to the
    # illumination gain).
    K, T2 = r.K1, r.pose2
    ii, jj = np.mgrid[0:hw, 0:hw]
    P = np.stack([(jj - K[0, 2]) * d1 / K[0, 0],
                  (ii - K[1, 2]) * d1 / K[1, 1], d1], -1)
    Pc2 = P @ T2[:3, :3].T + T2[:3, 3]
    uv = Pc2 @ K.T
    uv = uv[..., :2] / uv[..., 2:]
    inb = ((uv[..., 0] >= 1) & (uv[..., 0] < hw - 1)
           & (uv[..., 1] >= 1) & (uv[..., 1] < hw - 1) & (d1 > 0))
    u = np.clip(np.round(uv[..., 0]).astype(int), 0, hw - 1)
    v = np.clip(np.round(uv[..., 1]).astype(int), 0, hw - 1)
    nonocc = inb & (np.abs(d2[v, u] - Pc2[..., 2]) < 0.15)
    assert nonocc.mean() > 0.02
    g1 = cv2.cvtColor(im1, cv2.COLOR_RGB2GRAY).astype(float)
    g2 = cv2.cvtColor(im2, cv2.COLOR_RGB2GRAY).astype(float)
    corr = np.corrcoef(g1[nonocc], g2[v[nonocc], u[nonocc]])[0, 1]
    assert corr > 0.95, corr

    # The data layer recomputes GT boxes online from these depths/poses.
    ds = MegaDepthPairsDataset(str(tmp_path), pairs, image_size=(hw, hw),
                               train=False)
    item = ds[0]
    assert item["overlap_valid"]
    b1 = item["overlap_box1"]
    assert 0 <= b1[0] < b1[2] <= hw and 0 <= b1[1] < b1[3] <= hw
