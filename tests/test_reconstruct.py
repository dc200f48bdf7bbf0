"""End-to-end SfM: synthetic scene -> tracks -> triangulate -> BA -> ATE.

North-star config #5: matches -> COLMAP DB -> triangulation -> BA ->
model export -> ATE. The scene is a random point cloud observed by a
camera ring with noisy initial poses and noisy detections; the pipeline
must (a) decrease BA cost, (b) beat the initial ATE after BA, and
(c) round-trip through the COLMAP model/database writers.
"""
import numpy as np
import pytest


def _make_scene(rng, n_cams=6, n_pts=80, noise_px=0.5):
    from oetr_tpu.evalx.trajectory import so3_exp_np

    pts = rng.uniform(-1, 1, (n_pts, 3)) + np.array([0, 0, 6.0])
    K = np.tile(np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]),
                (n_cams, 1, 1))
    cams_gt = []
    for i in range(n_cams):
        # Wide-baseline arc (+-20 deg yaw, ~4-unit spread): keeps the
        # depth of the cloud well-conditioned for triangulation.
        ang = 0.7 * (i / (n_cams - 1) - 0.5)
        w = np.array([0.0, ang, 0.02 * i])
        t = np.array([4.0 * (i / (n_cams - 1) - 0.5), 0.1 * i, 0.2 * i])
        cams_gt.append(np.concatenate([w, t]))
    cams_gt = np.asarray(cams_gt)

    keypoints, visible = [], []
    for i in range(n_cams):
        R = so3_exp_np(cams_gt[i][:3])
        pc = pts @ R.T + cams_gt[i][3:]
        uv = (pc / pc[:, 2:3]) @ K[i].T
        kp = uv[:, :2] + rng.normal(0, noise_px, (n_pts, 2))
        keypoints.append(kp.astype(np.float32))
        visible.append(np.ones(n_pts, bool))

    matches = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            idx = np.arange(n_pts)
            matches[(i, j)] = np.stack([idx, idx])
    return pts, K, cams_gt, keypoints, matches


@pytest.mark.slow
def test_reconstruct_end_to_end(tmp_path, rng):
    from oetr_tpu.evalx.trajectory import absolute_trajectory_error
    from oetr_tpu.sfm import (export_colmap, export_database, read_model,
                              reconstruct)

    pts, K, cams_gt, keypoints, matches = _make_scene(rng)
    cams_init = cams_gt + np.concatenate([
        rng.normal(0, 0.01, (len(cams_gt), 3)),
        rng.normal(0, 0.05, (len(cams_gt), 3))], axis=1)
    cams_init[0] = cams_gt[0]            # gauge anchor

    recon = reconstruct(keypoints, matches, K, cams_init,
                        ba_iters=12, cg_iters=40, huber_delta=0.0)

    cost = recon["cost_history"]
    assert cost[-1] < 0.5 * cost[0], cost
    assert recon["point_valid"].sum() >= 60

    err_init = absolute_trajectory_error(cams_init, cams_gt)
    err_ba = absolute_trajectory_error(recon["cams"], cams_gt)
    assert err_ba["ate_rmse"] < err_init["ate_rmse"] * 0.5, (
        err_init["ate_rmse"], err_ba["ate_rmse"])
    assert err_ba["rot_err_mean_deg"] < err_init["rot_err_mean_deg"]

    # Reconstructed points close to GT cloud after gauge alignment
    # (fixing camera 0 pins 6 DOF but not scale). The synthetic matches
    # are identity index pairs, so obs_kp recovers each track's GT point
    # id — align the corresponded clouds with Umeyama, then compare.
    from oetr_tpu.evalx.trajectory import umeyama_3d
    tr = recon["tracks"]
    gt_id = np.zeros(tr.num_tracks, int)
    gt_id[tr.obs_pt] = tr.obs_kp       # all obs of a track share the kp id
    pv = recon["point_valid"]
    s, R, t = umeyama_3d(recon["pts"][pv], pts[gt_id[pv]])
    pts_al = (s * (R @ recon["pts"][pv].T)).T + t
    d = np.linalg.norm(pts_al - pts[gt_id[pv]], axis=-1)
    assert np.median(d) < 0.05, np.median(d)

    # COLMAP export round-trip.
    names = [f"im{i}.jpg" for i in range(len(K))]
    export_colmap(str(tmp_path / "model"), names, K, recon)
    cameras, images, points3D = read_model(str(tmp_path / "model"))
    assert len(cameras) == len(K) and len(images) == len(K)
    assert len(points3D) == int(pv.sum())

    two_view = {pair: {"matches": m, "E": np.eye(3)}
                for pair, m in list(matches.items())[:3]}
    export_database(str(tmp_path / "db.db"), names, K, keypoints, matches,
                    two_view=two_view)
    import sqlite3
    con = sqlite3.connect(str(tmp_path / "db.db"))
    n_img = con.execute("SELECT COUNT(*) FROM images").fetchone()[0]
    n_m = con.execute("SELECT COUNT(*) FROM matches").fetchone()[0]
    n_tv = con.execute(
        "SELECT COUNT(*) FROM two_view_geometries").fetchone()[0]
    con.close()
    assert n_img == len(K) and n_m == len(matches) and n_tv == 3


@pytest.mark.quick
def test_build_tracks_merge_conflicts(rng):
    from oetr_tpu.sfm import build_tracks

    kps = [rng.uniform(0, 100, (4, 2)).astype(np.float32) for _ in range(3)]
    matches = {
        (0, 1): np.array([[0, 1], [0, 1]]),          # kp0<->kp0, kp1<->kp1
        (1, 2): np.array([[0], [2]]),                # chain 0-0-2
        # conflict: image2 kp3 AND kp2 both join track of image1 kp0
        (0, 2): np.array([[0], [3]]),
    }
    tr = build_tracks(kps, matches, min_track_len=2)
    # conflicted track (two image-2 members) dropped; track (kp1, kp1) kept
    assert tr.num_tracks == 1
    assert len(tr.obs_cam) == 2


def test_ate_invariant_to_similarity(rng):
    from oetr_tpu.evalx.trajectory import (absolute_trajectory_error,
                                           so3_exp_np)

    cams = rng.normal(0, 0.3, (5, 6))
    # Gauge transform: rotate/scale/translate the world.
    err = absolute_trajectory_error(cams, cams)
    assert err["ate_rmse"] < 1e-9
