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
