"""Benchmark runner end-to-end, IMC math, viz, timer, pair generator."""
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.data.preprocess import (generate_pairs, pair_line,
                                      process_scene, scale_diff)
from oetr_tpu.evalx.imc_math import (eval_essential_matrix, evaluate_R_t,
                                     get_episym, get_projected_kp,
                                     get_repeatability)
from oetr_tpu.utils.timer import AverageTimer, VideoStreamer
from oetr_tpu.utils.viz import (error_colormap, make_matching_plot_fast,
                                visualize_overlap_gt)


def test_runner_end_to_end(tmp_path, rng):
    """SparsePipeline -> h5 -> megadepth harness, full circle."""
    from oetr_tpu.models import SuperPoint, nearest_neighbor_match
    from oetr_tpu.pipelines import PipelineConfig, SparsePipeline
    from oetr_tpu.pipelines.runner import run_benchmark
    from oetr_tpu.evalx import megadepth

    # Dataset: 2 pairs of identical textured images in scene dirs.
    ds = tmp_path / "data"
    os.makedirs(ds / "mega" / "scene0", exist_ok=True)
    img = (rng.uniform(0, 255, (12, 12, 3))).astype(np.uint8)
    img = cv2.resize(img, (96, 96), interpolation=cv2.INTER_NEAREST)
    names = []
    for i in range(4):
        n = f"mega/scene0/im{i}.jpg"
        cv2.imwrite(str(ds / n), img)
        names.append(n)
    K = np.array([[100.0, 0, 48], [0, 100.0, 48], [0, 0, 1]])
    T = np.eye(4)
    pairs_file = tmp_path / "pairs.txt"
    with open(pairs_file, "w") as f:
        for a, b in [(0, 1), (2, 3)]:
            fields = ([names[a], names[b]]
                      + [str(x) for x in K.reshape(-1)] * 2
                      + [str(x) for x in T.reshape(-1)]
                      + ["0"] * 8)
            f.write(" ".join(fields) + "\n")

    cfg = PipelineConfig(oetr_hw=(64, 64), canvas_hw=(96, 96),
                         fallback_min_matches=0)
    sp = SuperPoint(max_keypoints=64, keypoint_threshold=1e-5, nms_radius=2)
    sp_params = sp.init(jax.random.key(0), jnp.zeros((1, 96, 96, 1)))
    match_fn = lambda data: nearest_neighbor_match(
        data["descriptors0"], data["descriptors1"],
        data["valid0"], data["valid1"])
    pipe = SparsePipeline(sp, sp_params, match_fn, cfg=cfg)

    results = tmp_path / "results" / "ours"
    stats = run_benchmark(pipe, str(pairs_file), str(ds), str(results),
                          batch_size=2, with_overlap=False)
    assert stats["num_pairs"] == 2
    assert stats["matches_per_pair"] > 5

    # Identity pairs: epipolar math degenerates (T=I) but the h5 files must
    # be readable by the harness machinery.
    from oetr_tpu.utils.h5io import SceneResults
    sr = SceneResults(str(results), "scene0", pairwise=True)
    k0, k1, m, ip0, ip1 = sr.pair(names[0], names[1])
    assert m.shape[0] == 2 and m.shape[1] > 5
    # Identity pair: matched coordinates agree.
    err = np.linalg.norm(k0[m[0]] - k1[m[1]], axis=-1)
    assert np.median(err) < 1.5
    sr.close()


def test_runner_hpatches_end_to_end(tmp_path, rng):
    """Name-only pairs -> runner -> iter_hpatches_results -> MMA table."""
    from oetr_tpu.models import SuperPoint, nearest_neighbor_match
    from oetr_tpu.pipelines import PipelineConfig, SparsePipeline
    from oetr_tpu.pipelines.runner import run_benchmark
    from oetr_tpu.evalx import hpatches
    from oetr_tpu.evalx.datasets import (generate_hpatches_pairs,
                                         iter_hpatches_results)

    root = tmp_path / "hp"
    img = (rng.uniform(0, 255, (12, 12, 3))).astype(np.uint8)
    img = cv2.resize(img, (96, 96), interpolation=cv2.INTER_NEAREST)
    for seq in ("i_seq", "v_seq"):
        os.makedirs(root / seq, exist_ok=True)
        for i in range(1, 7):
            cv2.imwrite(str(root / seq / f"{i}.ppm"), img)
            if i > 1:
                np.savetxt(root / seq / f"H_1_{i}", np.eye(3))
    pairs_file = tmp_path / "hp_pairs.txt"
    n = generate_hpatches_pairs(str(root), str(pairs_file))
    assert n == 10

    cfg = PipelineConfig(oetr_hw=(64, 64), canvas_hw=(96, 96),
                         fallback_min_matches=0)
    sp = SuperPoint(max_keypoints=64, keypoint_threshold=1e-5, nms_radius=2)
    sp_params = sp.init(jax.random.key(0), jnp.zeros((1, 96, 96, 1)))
    match_fn = lambda data: nearest_neighbor_match(
        data["descriptors0"], data["descriptors1"],
        data["valid0"], data["valid1"])
    pipe = SparsePipeline(sp, sp_params, match_fn, cfg=cfg)

    results = tmp_path / "results"
    stats = run_benchmark(pipe, str(pairs_file), str(root), str(results),
                          batch_size=4, with_overlap=False, pairwise=False)
    assert stats["num_pairs"] == 10 and stats["num_scenes"] == 2

    recs = list(iter_hpatches_results(str(pairs_file), str(root),
                                      str(results)))
    table = hpatches.benchmark_results(recs)
    # Identity pair under identity homography: near-perfect MMA at 3px.
    assert table["overall"][3] > 0.9, table


def test_evaluate_R_t_and_essential(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("xyz", [5, 3, -2], degrees=True).as_matrix()
    t = np.array([1.0, 0.2, 0.1])
    eq, et = evaluate_R_t(R, t, R, t)
    assert eq < 1e-4 and et < 1e-4
    eq2, _ = evaluate_R_t(R, t, np.eye(3), t)
    assert np.degrees(eq2) > 4.0

    # eval_essential_matrix with exact correspondences.
    pts = rng.uniform(-1, 1, (64, 3)) + [0, 0, 5.0]
    x1 = pts[:, :2] / pts[:, 2:]
    p2 = pts @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:]
    t_skew = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = t_skew @ R
    eq3, et3 = eval_essential_matrix(x1, x2, E, R, t)
    assert np.degrees(eq3) < 0.5 and np.degrees(et3) < 1.0
    # Degenerate: too few points.
    assert eval_essential_matrix(x1[:3], x2[:3], E, R, t) == (np.pi,
                                                              np.pi / 2)


def test_projected_kp_and_episym(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("xyz", [2, -3, 1], degrees=True).as_matrix()
    t = np.array([[0.3], [0.1], [0.05]])
    pts = rng.uniform(-1, 1, (32, 3)) + [0, 0, 6.0]
    x1 = pts[:, :2] / pts[:, 2:]
    d1 = pts[:, 2:]
    p2 = pts @ R.T + t.ravel()
    x2 = p2[:, :2] / p2[:, 2:]
    d2 = p2[:, 2:]
    x1p, x2p = get_projected_kp(x1, x2, d1, d2, R, t)
    np.testing.assert_allclose(x1p, x2, atol=1e-9)
    np.testing.assert_allclose(x2p, x1, atol=1e-9)

    epi = get_episym(x1, x2, R, t.ravel())
    assert np.max(epi) < 1e-12

    rep = get_repeatability(x1p, x2, [0.01])
    assert rep[0] == 1.0
    assert get_repeatability(np.zeros((0, 2)), x2, [0.01]) == [0]


def test_viz_utils(tmp_path, rng):
    c = error_colormap(np.array([0.0, 0.5, 1.0]))
    assert c.shape == (3, 4)
    np.testing.assert_allclose(c[2, :2], [0.0, 1.0])   # high conf -> green

    img = (rng.uniform(0, 255, (64, 64))).astype(np.uint8)
    mk = rng.uniform(5, 59, (10, 2)).astype(np.float32)
    out = make_matching_plot_fast(img, img, mk, mk, error_colormap(
        rng.uniform(0, 1, 10)), path=str(tmp_path / "m.png"))
    assert out.shape[1] > 128 and os.path.exists(tmp_path / "m.png")

    ov = visualize_overlap_gt(img, [5, 5, 30, 30], [6, 6, 31, 31],
                              img, [10, 10, 40, 40], [11, 11, 39, 39])
    assert ov.shape == (64, 128, 3)

    from oetr_tpu.utils.viz import plot_mma_curves
    fig = plot_mma_curves(
        {"ours": np.linspace(0.2, 0.9, 10), "ref": np.linspace(0.1, 0.8, 10)},
        path=str(tmp_path / "mma.png"))
    assert os.path.exists(tmp_path / "mma.png")


def test_timer_and_streamer(tmp_path, rng):
    t = AverageTimer()
    t.update("stage1")
    t.update("stage2")
    t.print("test")             # should not raise
    assert "stage1" in t.times

    for i in range(3):
        cv2.imwrite(str(tmp_path / f"f{i}.jpg"),
                    (rng.uniform(0, 255, (32, 32))).astype(np.uint8))
    vs = VideoStreamer(str(tmp_path), resize=(16, 16))
    frames = []
    while True:
        f, ok = vs.next_frame()
        if not ok:
            break
        frames.append(f)
    assert len(frames) == 3
    assert frames[0].shape == (16, 16)
    assert 0.0 <= frames[0].min() and frames[0].max() <= 1.0


def test_pair_generator(tmp_path, rng):
    """scene_info npz -> pairs txt -> parseable by the dataset parser."""
    import h5py
    from oetr_tpu.data.pairs import parse_pairs_line

    ds = tmp_path
    os.makedirs(ds / "scene_info", exist_ok=True)
    os.makedirs(ds / "depths", exist_ok=True)
    n_img = 4
    K = np.array([[50.0, 0, 24], [0, 50.0, 24], [0, 0, 1]])
    poses, dpaths, ipaths = [], [], []
    for i in range(n_img):
        T = np.eye(4)
        # Alternate distances -> strong scale difference between pairs.
        T[:3, 3] = [0.3 * i, 0.0, 0.0 if i % 2 == 0 else -5.0]
        poses.append(T)
        dp = f"depths/d{i}.h5"
        with h5py.File(ds / dp, "w") as f:
            f.create_dataset("/depth", data=np.full((48, 48), 10.0 + 5 * (i % 2)))
        dpaths.append(dp)
        ipaths.append(f"imgs/im{i}.jpg")
    overlap = np.full((n_img, n_img), 0.4)
    np.savez(ds / "scene_info" / "0000.0.npz",
             overlap_matrix=overlap,
             scale_ratio_matrix=np.ones((n_img, n_img)),
             image_paths=np.array(ipaths), depth_paths=np.array(dpaths),
             intrinsics=np.array([K] * n_img), poses=np.array(poses))

    out = process_scene("0000", str(ds), pairs_per_scene=10,
                        min_box_scale_diff=0.0, seed=0)
    lines = [ln for ln in out.splitlines() if ln]
    assert len(lines) > 0
    rec = parse_pairs_line(lines[0])
    assert rec is not None
    assert rec.K1.shape == (3, 3)

    # scale_diff sanity.
    assert scale_diff([0, 0, 10, 10], [0, 0, 20, 20]) == 2.0


def test_runner_native_loader_matches_python(tmp_path, rng):
    """use_native=True produces the same keypoints/matches as the Python
    image path (the C++ data service wired into the benchmark runner)."""
    from oetr_tpu.data.native import native_available
    if not native_available():
        pytest.skip("native data service unavailable")

    from oetr_tpu.models import SuperPoint, nearest_neighbor_match
    from oetr_tpu.pipelines import PipelineConfig, SparsePipeline
    from oetr_tpu.pipelines.runner import run_benchmark

    ds = tmp_path / "data"
    os.makedirs(ds / "mega" / "scene0", exist_ok=True)
    img = (rng.uniform(0, 255, (12, 12, 3))).astype(np.uint8)
    img = cv2.resize(img, (96, 96), interpolation=cv2.INTER_NEAREST)
    names = []
    for i in range(2):
        n = f"mega/scene0/im{i}.jpg"
        cv2.imwrite(str(ds / n), img)
        names.append(n)
    K = np.array([[100.0, 0, 48], [0, 100.0, 48], [0, 0, 1]])
    T = np.eye(4)
    pairs_file = tmp_path / "pairs.txt"
    with open(pairs_file, "w") as f:
        fields = ([names[0], names[1]]
                  + [str(x) for x in K.reshape(-1)] * 2
                  + [str(x) for x in T.reshape(-1)] + ["0"] * 8)
        f.write(" ".join(fields) + "\n")

    cfg = PipelineConfig(oetr_hw=(64, 64), canvas_hw=(96, 96),
                         fallback_min_matches=0)
    sp = SuperPoint(max_keypoints=64, keypoint_threshold=1e-5, nms_radius=2)
    sp_params = sp.init(jax.random.key(0), jnp.zeros((1, 96, 96, 1)))
    match_fn = lambda data: nearest_neighbor_match(
        data["descriptors0"], data["descriptors1"],
        data["valid0"], data["valid1"])
    pipe = SparsePipeline(sp, sp_params, match_fn, cfg=cfg)

    from oetr_tpu.utils.h5io import SceneResults
    res = {}
    for tag, native in (("py", False), ("nat", True)):
        outdir = tmp_path / "results" / tag
        run_benchmark(pipe, str(pairs_file), str(ds), str(outdir),
                      batch_size=1, with_overlap=False, use_native=native)
        sr = SceneResults(str(outdir), "scene0", pairwise=True)
        res[tag] = sr.pair(names[0], names[1])
        sr.close()
    np.testing.assert_allclose(res["py"][0], res["nat"][0], atol=1.0)
    assert res["py"][2].shape == res["nat"][2].shape
