"""IMC/HPatches pair generation + result iteration."""
import os

import h5py
import numpy as np

from oetr_tpu.evalx.datasets import (calib_to_matrix, generate_hpatches_pairs,
                                     generate_imc_pairs,
                                     iter_hpatches_results)
from oetr_tpu.data.pairs import load_eval_pairs


def test_generate_imc_pairs(tmp_path, rng):
    ds = tmp_path
    scene = "phototourism-val/british_museum"
    cal = ds / scene / "set_100" / "calibration"
    vis = ds / scene / "set_100" / "new-vis-pairs"
    os.makedirs(cal)
    os.makedirs(vis)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    from scipy.spatial.transform import Rotation
    for name in ("a", "b"):
        with h5py.File(cal / f"calibration_{name}.h5", "w") as f:
            f.create_dataset("K", data=K)
            f.create_dataset("R", data=Rotation.random(
                random_state=hash(name) % 100).as_matrix())
            f.create_dataset("T", data=rng.normal(size=3))
    np.save(vis / "keys-th-0.1.npy", np.array(["a-b"]))
    scenes = tmp_path / "scenes.txt"
    scenes.write_text(f"{scene} jpg\n")
    out = tmp_path / "pairs.txt"
    n = generate_imc_pairs(str(scenes), str(ds), str(out), 0.1)
    assert n == 1
    pairs = load_eval_pairs(str(out))
    assert len(pairs) == 1
    p = pairs[0]
    assert p.name0.endswith("a.jpg")
    np.testing.assert_allclose(p.K0, K)
    # Relative pose is a valid rigid transform.
    R = p.T_0to1[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_hpatches_generation_and_iteration(tmp_path, rng):
    root = tmp_path / "hp"
    res = tmp_path / "res"
    for seq in ("i_ajuntament", "v_abstract"):
        os.makedirs(root / seq)
        for i in range(2, 7):
            np.savetxt(root / seq / f"H_1_{i}", np.eye(3))
        os.makedirs(res / seq, exist_ok=True)
        k = rng.uniform(0, 100, (10, 2))
        with h5py.File(res / seq / "keypoints.h5", "w") as f:
            for i in range(1, 7):
                f.create_dataset(str(i), data=k)
        with h5py.File(res / seq / "matches.h5", "w") as f:
            m = np.stack([np.arange(10), np.arange(10)])
            for i in range(2, 7):
                f.create_dataset(f"1-{i}", data=m)
    pairs_file = tmp_path / "hpairs.txt"
    n = generate_hpatches_pairs(str(root), str(pairs_file))
    assert n == 10

    recs = list(iter_hpatches_results(str(pairs_file), str(root), str(res)))
    assert len(recs) == 10
    assert recs[0]["matches"].shape == (10, 2)
    # Identity homography + identical keypoints -> zero reprojection error.
    from oetr_tpu.evalx import hpatches
    table = hpatches.benchmark_results(recs)
    assert table["illumination"][1] == 1.0
    assert table["viewpoint"][1] == 1.0
