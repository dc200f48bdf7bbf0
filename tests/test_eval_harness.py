"""Benchmark harnesses end-to-end on synthetic scenes written in the
reference's h5 result format (base_loader.py / evaluation.py layouts)."""
import os

import numpy as np
import pytest

from oetr_tpu.data.pairs import load_eval_pairs
from oetr_tpu.evalx import hpatches, imc, megadepth, validation_error
from oetr_tpu.evalx.twoview import correct_intrinsics
from oetr_tpu.utils.h5io import (SceneResults, pair_key, save_scene_results,
                                 stem)


def _make_scene(rng, n_pairs=4, n_kpts=120, noise=0.3, outlier_frac=0.15):
    """Synthetic scene: known K, relative poses, perfect-ish matches."""
    from scipy.spatial.transform import Rotation
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    pairs, keypoints, matches = [], {}, {}
    for i in range(n_pairs):
        R = Rotation.from_euler("xyz", rng.uniform(-10, 10, 3),
                                degrees=True).as_matrix()
        t = rng.normal(size=3)
        t /= np.linalg.norm(t)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        pts = rng.uniform(-3, 3, (n_kpts, 3)) + [0, 0, 8.0]
        uv0 = (pts / pts[:, 2:]) @ K.T
        p1 = pts @ R.T + t
        uv1 = (p1 / p1[:, 2:]) @ K.T
        k0 = uv0[:, :2] + rng.normal(0, noise, (n_kpts, 2))
        k1 = uv1[:, :2] + rng.normal(0, noise, (n_kpts, 2))
        n_out = int(n_kpts * outlier_frac)
        k1[rng.choice(n_kpts, n_out, replace=False)] = rng.uniform(
            0, 640, (n_out, 2))
        name0 = f"mega/scene0/im{2*i}.jpg"
        name1 = f"mega/scene0/im{2*i+1}.jpg"
        keypoints[stem(name0)] = k0
        keypoints[stem(name1)] = k1
        matches[pair_key(name0, name1)] = np.stack(
            [np.arange(n_kpts), np.arange(n_kpts)])
        pairs.append((name0, name1, K, K, T))
    return pairs, keypoints, matches


def _write_pairs_file(path, pairs):
    with open(path, "w") as f:
        for name0, name1, K0, K1, T in pairs:
            fields = ([name0, name1]
                      + [str(x) for x in K0.reshape(-1)]
                      + [str(x) for x in K1.reshape(-1)]
                      + [str(x) for x in T.reshape(-1)]
                      + ["0", "0", "640", "480", "0", "0", "640", "480"])
            f.write(" ".join(fields) + "\n")


def test_megadepth_harness(tmp_path, rng):
    pairs, keypoints, matches = _make_scene(rng)
    results = tmp_path / "results" / "method_a"
    save_scene_results(str(results), "scene0", keypoints, matches)
    pairs_file = tmp_path / "pairs.txt"
    _write_pairs_file(pairs_file, pairs)

    aucs, prec, ms = megadepth.benchmark_results(str(pairs_file), str(results))
    # 85% inliers at 0.3 px noise: pose should be recovered well.
    assert aucs[2] > 50.0, aucs          # AUC@20 x100
    assert prec > 60.0                   # epipolar precision x100
    assert 0 < ms <= 100.0

    table = megadepth.summary_table({"synthetic": [aucs, prec, ms]})
    assert "AUC@5" in table and "synthetic" in table


def test_imc_harness(tmp_path, rng):
    pairs, keypoints, matches = _make_scene(rng, n_pairs=3)
    # Rename dataset to an IMC one for threshold lookup.
    pairs = [(n0.replace("mega/", "phototourism-val/"),
              n1.replace("mega/", "phototourism-val/"), K0, K1, T)
             for n0, n1, K0, K1, T in pairs]
    results = tmp_path / "results" / "m"
    save_scene_results(str(results), "scene0", keypoints, matches)
    pairs_file = tmp_path / "pairs.txt"
    _write_pairs_file(pairs_file, pairs)

    data, aucs, prec, ms, mAA = imc.benchmark_results(
        str(pairs_file), str(results),
        dynamic_threshold=imc.dynamic_threshold_for("oetr_superglue"))
    assert data[0] == "phototourism-val" and data[-1] == "total"
    assert len(aucs) == 2 and len(mAA) == 2
    assert mAA[-1] > 20.0

    assert imc.dynamic_threshold_for("oetr_NN") == "nn"
    assert imc.dynamic_threshold_for("loftr") == ""


def test_hpatches_harness(rng):
    H = np.array([[1.1, 0.02, 4.0], [0.01, 0.95, -2.0], [1e-5, 0, 1.0]])
    k0 = rng.uniform(0, 300, (50, 2))
    from oetr_tpu.geometry.homography import apply_homography
    import jax.numpy as jnp
    k1 = np.array(apply_homography(jnp.asarray(H), jnp.asarray(k0)))
    k1 += rng.normal(0, 1.0, k1.shape)
    m = np.stack([np.arange(50), np.arange(50)], axis=1)
    recs = [
        {"seq_name": "i_seq", "H_gt": H, "kpts0": k0, "kpts1": k1,
         "matches": m},
        {"seq_name": "v_seq", "H_gt": H, "kpts0": k0, "kpts1": k1 + 100.0,
         "matches": m},   # badly warped viewpoint pair
    ]
    table = hpatches.benchmark_results(recs)
    assert table["illumination"][3] > 0.9       # ~1px noise within 3px
    assert table["viewpoint"][3] < 0.1
    assert abs(table["overall"][3]
               - (table["illumination"][3] + table["viewpoint"][3]) / 2) < 1e-9


def test_intrinsics_correction_identity():
    K = np.array([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]])
    # inparams for "no crop, no resize": sx=sy=1? The correction must be
    # invertible and produce a valid K-like matrix.
    inparams = np.array([1.0, 1.0, 0.0, 0.0, 1.0, 1.0])
    K2 = correct_intrinsics(K, inparams)
    np.testing.assert_allclose(K2, K, atol=1e-9)


def test_scene_results_roundtrip(tmp_path, rng):
    k = {"a": rng.uniform(0, 10, (5, 2)), "b": rng.uniform(0, 10, (7, 2))}
    m = {"a-b": np.stack([np.arange(3), np.arange(3)])}
    ip = {"a-b": np.arange(6.0), "b-a": np.arange(6.0) + 1}
    save_scene_results(str(tmp_path), "s", k, m, inparams=ip)
    sr = SceneResults(str(tmp_path), "s")
    k0, k1, mm, ip0, ip1 = sr.pair("x/a.jpg", "x/b.jpg")
    np.testing.assert_allclose(k0, k["a"])
    np.testing.assert_allclose(mm, m["a-b"])
    np.testing.assert_allclose(ip0, ip["a-b"])
    np.testing.assert_allclose(ip1, ip["b-a"])
    sr.close()


@pytest.mark.slow
def test_sift_nn_pose_auc_end_to_end(tmp_path):
    """Full chain on synthetic planar scenes: SIFT -> NN -> RANSAC
    (homography fallback regime) -> reference metric protocol. Small
    version of scripts/eval_demo.py; asserts meaningful pose AUC."""
    import cv2
    import jax.numpy as jnp

    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene
    from oetr_tpu.evalx.metrics import pose_auc
    from oetr_tpu.evalx.twoview import validation_error
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints

    pairs_txt = generate_scene(str(tmp_path), n_pairs=8, image_hw=200,
                               max_shift_px=50, seed=11)
    ds = MegaDepthPairsDataset(str(tmp_path), pairs_txt,
                               image_size=(200, 200), train=False)
    errors = []
    for i in range(len(ds)):
        item = ds[i]
        g0 = cv2.cvtColor((item["image1"] * 255).astype(np.uint8),
                          cv2.COLOR_RGB2GRAY)
        g1 = cv2.cvtColor((item["image2"] * 255).astype(np.uint8),
                          cv2.COLOR_RGB2GRAY)
        xy0, _, v0, d0 = sift_keypoints(g0, 512, with_descriptors=True)
        xy1, _, v1, d1 = sift_keypoints(g1, 512, with_descriptors=True)
        m = nearest_neighbor_match(jnp.asarray(d0)[None],
                                   jnp.asarray(d1)[None],
                                   jnp.asarray(v0)[None],
                                   jnp.asarray(v1)[None],
                                   ratio_threshold=0.9)
        matches0 = np.asarray(m["matches0"][0])
        sel = matches0 > -1
        matches = np.stack([np.nonzero(sel)[0], matches0[sel]])
        T_0to1 = item["pose2"] @ np.linalg.inv(item["pose1"])
        res = validation_error(xy0, xy1, matches, item["intrinsics1"],
                               item["intrinsics2"], T_0to1)
        errors.append(max(res["error_t"], res["error_R"]))
    aucs = pose_auc(errors, [10])
    assert aucs[0] > 0.6, (aucs, errors)


@pytest.mark.slow
def test_hpatches_mma_end_to_end(rng):
    """HPatches protocol on synthetic warps: texture -> known homography
    -> SIFT -> NN -> MMA table. The viewpoint-split MMA@3 must be high
    for correct matching under the GT H."""
    import cv2
    import jax.numpy as jnp

    from oetr_tpu.data.synthetic import _texture
    from oetr_tpu.evalx.hpatches import benchmark_results
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints

    records = []
    for s in range(3):
        g = np.random.default_rng(100 + s)
        base = cv2.cvtColor(_texture(g, 240, 240), cv2.COLOR_RGB2GRAY)
        for k in range(2):
            # Mild projective warp around the center.
            src = np.float32([[0, 0], [240, 0], [240, 240], [0, 240]])
            dst = src + g.uniform(-25, 25, (4, 2)).astype(np.float32)
            H = cv2.getPerspectiveTransform(src, dst)
            warped = cv2.warpPerspective(base, H, (240, 240))
            xy0, _, v0, d0 = sift_keypoints(base, 512,
                                            with_descriptors=True)
            xy1, _, v1, d1 = sift_keypoints(warped, 512,
                                            with_descriptors=True)
            m = nearest_neighbor_match(jnp.asarray(d0)[None],
                                       jnp.asarray(d1)[None],
                                       jnp.asarray(v0)[None],
                                       jnp.asarray(v1)[None],
                                       ratio_threshold=0.9)
            matches0 = np.asarray(m["matches0"][0])
            sel = matches0 > -1
            matches = np.stack([np.nonzero(sel)[0], matches0[sel]], -1)
            records.append({"seq_name": f"v_synth{s}", "H_gt": H,
                            "kpts0": xy0, "kpts1": xy1,
                            "matches": matches})
    table = benchmark_results(records)
    assert table["viewpoint"][3] > 0.6, table["viewpoint"]
    assert table["viewpoint"][15] >= table["viewpoint"][1]
