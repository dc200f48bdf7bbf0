#!/usr/bin/env python
"""End-to-end SfM demo: images -> matches -> tracks -> BA -> ATE.

The reference only ships COLMAP *I/O* for SfM (dormant layer L6,
/root/reference/dloc/core/utils/database.py:138,
read_write_model.py:453-476 — no script drives it). This script runs the
whole reconstruction through THIS framework's machinery on a multi-view
synthetic scene with exact ground truth:

  1. render N views of one textured 3-D plane set along a camera arc
     (same exact ray-caster as data/synthetic.generate_scene_3d);
  2. detect + match with the real matching stack (SIFT+NN by default —
     the measured-strongest matcher on these scenes, BASELINE.md §6 —
     or the trained SP+SG checkpoints via --matcher sp_sg);
  3. two-view RANSAC (geometry/ransac.estimate_pose, 5-point + MSAC) per
     edge: inlier filtering AND the relative-pose chain;
  4. incremental pose init from the matches alone: compose relative
     poses along the chain, resolving each edge's unknown baseline
     scale from shared-track triangulated depths (median depth ratio) —
     no GT pose enters the estimate;
  5. tracks (sfm/reconstruct.build_tracks) -> DLT triangulation ->
     Schur-complement LM bundle adjustment (sfm/ba.bundle_adjust);
  6. ATE vs the GT trajectory (evalx/trajectory) before and after BA
     (the artifact gate: BA must beat its initialization), plus a
     COLMAP model + database export (sfm/reconstruct.export_colmap).

Prints ONE JSON line (the BASELINE.md SfM-ATE row).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def render_rig(n_views: int, hw: int, seed: int, arc_deg: float = 30.0,
               depth_bg: float = 12.0, noise: float = 0.0):
    """N cameras on a lateral arc looking at a shared 3-D plane set.

    Returns (images [N, hw, hw, 3] uint8, K [3, 3], gt_cams6 [N, 6]
    world->cam (so3 log, t), depths list of [hw, hw]).
    """
    import cv2  # noqa: F401  (texture gen uses it)
    import numpy as np

    from oetr_tpu.data.synthetic import _render_planes, _rot, _texture

    rng = np.random.default_rng(seed)
    f = 0.9 * hw
    K = np.array([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1.0]])

    # Shared scene: background plane + 2-3 floating foreground planes
    # (parallax/occlusion — the regime where BA has real work to do).
    # The plane must cover every camera's footprint, including the
    # yawed arc-end views (a too-small plane leaves the end views
    # staring at black void and their edges starve of features).
    half_bg = ((depth_bg / f) * hw * 1.2
               + 2.0 * depth_bg * np.sin(np.deg2rad(arc_deg / 2)))
    ppw_bg = min(f / depth_bg, 3072 / (2 * half_bg))
    # Feature-dense background: _texture's detail density is fixed per
    # call, so one call over a huge plane leaves the arc-end views
    # (which see only background) nearly featureless — tile it from
    # independent patches instead so every footprint has corners.
    tw = int(2 * half_bg * ppw_bg)
    bg_tex = np.zeros((tw, tw, 3), np.uint8)
    ps = 160
    for y in range(0, tw, ps):
        for x in range(0, tw, ps):
            bg_tex[y:y + ps, x:x + ps] = _texture(
                rng, min(ps, tw - y), min(ps, tw - x))
    planes = [{
        "z": depth_bg, "x0": -half_bg, "y0": -half_bg,
        "x1": half_bg, "y1": half_bg, "tex": bg_tex, "ppw": ppw_bg,
    }]
    for _ in range(3):
        zf = float(rng.uniform(0.5, 0.8)) * depth_bg
        half = float(rng.uniform(0.10, 0.2)) * (zf / f) * hw
        cx = float(rng.uniform(-0.25, 0.25)) * (zf / f) * hw
        cy = float(rng.uniform(-0.25, 0.25)) * (zf / f) * hw
        ppw = min(f / zf, 512 / (2 * half))
        tws = max(int(np.ceil(2 * half * ppw)), 16)
        planes.append({"z": zf, "x0": cx - half, "y0": cy - half,
                       "x1": cx + half, "y1": cy + half,
                       "tex": _texture(rng, tws, tws), "ppw": ppw})
    planes.sort(key=lambda p: -p["z"])

    # Arc: cameras orbit laterally around the scene center at depth_bg,
    # yawing to keep it centered (strong pairwise overlap, nonzero
    # rotation at every step).
    images, cams6, depths = [], [], []
    angs = np.deg2rad(np.linspace(-arc_deg / 2, arc_deg / 2, n_views))
    radius = depth_bg
    for a in angs:
        c = np.array([radius * np.sin(a), 0.1 * radius * np.sin(2 * a),
                      radius - radius * np.cos(a)])
        yaw = -a  # look back toward the scene center
        R = _rot(0.0, yaw, 0.0)
        img, d = _render_planes(planes, K, R, c, hw)
        if noise > 0:
            img = np.clip(img.astype(np.float32)
                          + rng.normal(0, noise, img.shape), 0,
                          255).astype(np.uint8)
        images.append(img)
        depths.append(d)
        t = -R @ c
        # so3 log of R
        cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
        th = np.arccos(cos)
        if th < 1e-8:
            w = np.zeros(3)
        else:
            w = th / (2 * np.sin(th)) * np.array(
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        cams6.append(np.concatenate([w, t]))
    return (np.stack(images), K, np.stack(cams6).astype(np.float64),
            depths)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_views", type=int, default=12)
    ap.add_argument("--hw", type=int, default=320)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--topk", type=int, default=1024)
    ap.add_argument("--max_span", type=int, default=3,
                    help="match view pairs (i, j) with j - i <= span")
    ap.add_argument("--matcher", choices=("sift_nn", "sp_sg", "loftr"),
                    default="sift_nn")
    ap.add_argument("--ckpt_dir", default=".ckpt_matching_r5",
                    help="SP/SG checkpoint dir for --matcher sp_sg")
    ap.add_argument("--ba_iters", type=int, default=20)
    ap.add_argument("--arc_deg", type=float, default=45.0)
    ap.add_argument("--noise", type=float, default=6.0,
                    help="gaussian pixel noise std (0-255 units) — "
                         "degrades keypoint localization so the chained "
                         "init drifts and BA has honest work to do")
    ap.add_argument("--export", default="",
                    help="dir for COLMAP model + database export")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.evalx.trajectory import absolute_trajectory_error
    from oetr_tpu.geometry.ransac import estimate_pose
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints
    from oetr_tpu.sfm.ba import triangulate_points
    from oetr_tpu.sfm.reconstruct import (export_colmap, export_database,
                                          reconstruct)

    t0 = time.time()
    log(f"rendering {args.n_views}-view rig ({args.hw}^2)...")
    images, K, gt_cams6, _ = render_rig(args.n_views, args.hw, args.seed,
                                        arc_deg=args.arc_deg,
                                        noise=args.noise)
    n = args.n_views
    k = args.topk

    # ---- detect ------------------------------------------------------
    if args.matcher == "loftr":
        # Dense detector-free matcher (the repo's strongest learned
        # stack, BASELINE.md §7). Track nodes are coarse grid cells:
        # query-side matches ARE cell centers (the model samples there);
        # target-side continuous correspondences are quantized to the
        # nearest cell for cross-edge track linking (the standard
        # dense-matcher-in-SfM compromise — observation noise is then
        # bounded by the 8px cell, while the two-view RANSAC below
        # still uses the CONTINUOUS fine-refined positions).
        import orbax.checkpoint as ocp

        from oetr_tpu.models.loftr import LoFTR
        hc = args.hw // 8
        lf = LoFTR(d_coarse=192, d_fine=96, coarse_layers=4,
                   max_matches=1024)
        tmpl = jax.jit(lf.init)(jax.random.key(0),
                                jnp.zeros((1, args.hw, args.hw, 1)),
                                jnp.zeros((1, args.hw, args.hw, 1)))
        lfp = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(".ckpt_loftr_r5", "loftr")), tmpl)
        lf_fwd = jax.jit(lambda a, b: lf.apply(lfp, a, b))
        gray = jnp.asarray(images, jnp.float32).mean(-1,
                                                     keepdims=True) / 255
        u = np.arange(hc, dtype=np.float32) * 8 + 3.5
        gy, gx = np.meshgrid(u, u, indexing="ij")
        grid_xy = np.stack([gx.reshape(-1), gy.reshape(-1)],
                           -1).astype(np.float32)
        kps = [grid_xy for _ in range(n)]
        valids = [np.ones(hc * hc, bool) for _ in range(n)]
    elif args.matcher == "sift_nn":
        kps, descs, valids = [], [], []
        for im in images:
            g = cv2.cvtColor(im, cv2.COLOR_RGB2GRAY)
            xy, _, v, d = sift_keypoints(g, k, with_descriptors=True)
            kps.append(xy)
            descs.append(d)
            valids.append(v)
    else:
        import orbax.checkpoint as ocp

        from oetr_tpu.models.superpoint import SuperPoint, SuperPointNet
        net = SuperPointNet(descriptor_dim=128)
        tmpl = jax.jit(net.init)(jax.random.key(0),
                                 jnp.zeros((1, 128, 128, 1)))
        raw = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(args.ckpt_dir, "superpoint")),
            tmpl)
        sp = SuperPoint(max_keypoints=k, keypoint_threshold=0.0,
                        descriptor_dim=128)
        spp = {"params": {"net": raw["params"]}}
        gray = jnp.asarray(images, jnp.float32).mean(-1, keepdims=True) / 255
        e = jax.jit(sp.apply)(spp, gray)
        kps = [np.asarray(e["keypoints"][i]) for i in range(n)]
        descs = [np.asarray(e["descriptors"][i]) for i in range(n)]
        valids = [np.asarray(e["valid"][i]) for i in range(n)]
        sp_feats = e
        # The real SuperGlue matcher on the shipped checkpoint (not NN
        # over SP descriptors — SG doubles NN's assign precision,
        # BASELINE.md §6).
        from oetr_tpu.models.superglue import SuperGlue
        sg = SuperGlue(descriptor_dim=128)
        dummy = {
            "keypoints0": jnp.zeros((1, k, 2)),
            "keypoints1": jnp.zeros((1, k, 2)),
            "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
            "descriptors0": jnp.zeros((1, k, 128)),
            "descriptors1": jnp.zeros((1, k, 128)),
            "valid0": jnp.ones((1, k), bool),
            "valid1": jnp.ones((1, k), bool),
        }
        hw_t = (args.hw, args.hw)
        sg_tmpl = jax.jit(lambda kk, dd: sg.init(
            kk, dict(dd, image_hw0=hw_t, image_hw1=hw_t)))(
                jax.random.key(1), dummy)
        sgp = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(args.ckpt_dir, "superglue")),
            sg_tmpl)
        sg_match = jax.jit(lambda dd: sg.apply(
            sgp, dict(dd, image_hw0=hw_t, image_hw1=hw_t)))

    # ---- match + two-view RANSAC per edge ----------------------------
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)
             if j - i <= args.max_span]
    matches = {}
    rel = {}       # (i, j) -> (R, t_unit) cam_i -> cam_j
    for (i, j) in edges:
        if args.matcher == "loftr":
            out = lf_fwd(gray[i:i + 1], gray[j:j + 1])
            v = np.asarray(out["valid"][0])
            ia = np.asarray(out["cells0"][0])[v]          # unique rows
            xy1 = np.asarray(out["mkpts1"][0])[v]         # continuous
            conf = np.asarray(out["conf"][0])[v]
            cb = (np.clip(np.round((xy1 - 3.5) / 8.0), 0,
                          hc - 1).astype(np.int64))
            ib = cb[:, 1] * hc + cb[:, 0]
            # one observation per target cell (highest confidence) so
            # union-find doesn't chain-merge distinct tracks.
            order = np.argsort(-conf)
            keep, seen = [], set()
            for idx in order:
                if int(ib[idx]) in seen:
                    continue
                seen.add(int(ib[idx]))
                keep.append(idx)
            keep = np.asarray(sorted(keep), np.int64)
            ia, ib, xy1 = ia[keep], ib[keep], xy1[keep]
            if len(ia) < 16:
                continue
            p0 = kps[i][ia].astype(np.float32)
            p1 = xy1.astype(np.float32)
        elif args.matcher == "sp_sg":
            m = sg_match({
                "keypoints0": sp_feats["keypoints"][i:i + 1],
                "keypoints1": sp_feats["keypoints"][j:j + 1],
                "scores0": sp_feats["scores"][i:i + 1],
                "scores1": sp_feats["scores"][j:j + 1],
                "descriptors0": sp_feats["descriptors"][i:i + 1],
                "descriptors1": sp_feats["descriptors"][j:j + 1],
                "valid0": sp_feats["valid"][i:i + 1],
                "valid1": sp_feats["valid"][j:j + 1],
            })
        else:
            m = nearest_neighbor_match(
                jnp.asarray(descs[i])[None], jnp.asarray(descs[j])[None],
                jnp.asarray(valids[i])[None], jnp.asarray(valids[j])[None],
                ratio_threshold=0.95)
        if args.matcher != "loftr":
            m0 = np.asarray(m["matches0"][0])
            sel = (m0 > -1) & valids[i]
            ia = np.nonzero(sel)[0]
            ib = m0[sel]
            if len(ia) < 16:
                continue
            p0 = kps[i][ia].astype(np.float32)
            p1 = kps[j][ib].astype(np.float32)
        pad = max(64, 1 << int(np.ceil(np.log2(len(p0)))))
        P0 = np.zeros((pad, 2), np.float32)
        P1 = np.zeros((pad, 2), np.float32)
        P0[:len(p0)] = p0
        P1[:len(p1)] = p1
        vm = np.zeros(pad, bool)
        vm[:len(p0)] = True
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            res = estimate_pose(jnp.asarray(P0), jnp.asarray(P1),
                                jnp.asarray(vm), jnp.asarray(K),
                                jnp.asarray(K),
                                jax.random.key(100 + 31 * i + j),
                                thresh_px=1.0, use_5pt=True)
        if not bool(res["ok"]):
            continue
        inl = np.asarray(res["inliers"])[:len(p0)]
        if inl.sum() < 12:
            continue
        matches[(i, j)] = np.stack([ia[inl], ib[inl]])
        rel[(i, j)] = (np.asarray(res["R"], np.float64),
                       np.asarray(res["t"], np.float64))
        log(f"edge ({i},{j}): {int(inl.sum())} inliers / {len(p0)}")

    for (i, j) in [(a, a + 1) for a in range(n - 1)]:
        if (i, j) not in rel:
            raise SystemExit(f"chain edge ({i},{j}) failed — scene too hard")

    # ---- incremental pose init from matches alone --------------------
    # Gauge: cam0 = identity, edge (0,1) baseline = 1. Each later edge's
    # scale comes from shared keypoints: depth of the SAME keypoint in
    # cam i from the already-reconstructed frame vs from the unit-
    # baseline two-view triangulation of edge (i, i+1).
    def two_view_depths(i, j, R, t):
        """Triangulated cam-i depths for each inlier match of (i, j)."""
        ia, ib = matches[(i, j)]
        p0 = kps[i][ia]
        p1 = kps[j][ib]
        c0 = np.zeros(6)
        w = _log_so3(R)
        c1 = np.concatenate([w, t])
        cams = jnp.asarray(np.stack([np.tile(c0, (len(p0), 1)),
                                     np.tile(c1, (len(p0), 1))]),
                           jnp.float32).transpose(1, 0, 2)
        Ks = jnp.asarray(np.tile(K[None, None], (len(p0), 2, 1, 1)),
                         jnp.float32)
        uv = jnp.asarray(np.stack([p0, p1], axis=1), jnp.float32)
        ok = jnp.ones((len(p0), 2), bool)
        pts = np.asarray(triangulate_points(cams, Ks, uv, ok))
        return ia, ib, pts[:, 2]

    def _log_so3(R):
        cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
        th = np.arccos(cos)
        if th < 1e-8:
            return np.zeros(3)
        return th / (2 * np.sin(th)) * np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])

    Kinv = np.linalg.inv(K)

    def forward_depths(i, ia, ib, depths_i, Rr, tr_scaled, into):
        """Record cam-(i+1) depths by lifting cam-i keypoints through
        the (scaled) edge transform."""
        for a, b, d in zip(ia.tolist(), ib.tolist(), depths_i.tolist()):
            if d <= 1e-6:
                continue
            x = Kinv @ np.array([kps[i][a][0], kps[i][a][1], 1.0])
            pc = Rr @ (x * d) + tr_scaled
            if pc[2] > 1e-6:
                into[b] = float(pc[2])

    Rw = [np.eye(3)]
    tw = [np.zeros(3)]
    kp_depth = [dict() for _ in range(n)]   # per-view: kp idx -> cam depth
    R01, t01 = rel[(0, 1)]
    ia, ib, d0 = two_view_depths(0, 1, R01, t01)
    kp_depth[0].update({a: float(d) for a, d in zip(ia.tolist(),
                                                    d0.tolist())
                        if d > 1e-6})
    forward_depths(0, ia, ib, d0, R01, t01, kp_depth[1])
    Rw.append(R01.copy())
    tw.append(t01.copy())
    for i in range(1, n - 1):
        Rr, tr = rel[(i, i + 1)]
        ia, ib, d_local = two_view_depths(i, i + 1, Rr, tr)
        # Scale of this edge's unit baseline: shared cam-i keypoints
        # have a depth in the GLOBAL frame (recorded while composing the
        # previous edge) and one from this edge's unit-baseline
        # triangulation — their median ratio is the baseline scale.
        num, den = [], []
        for idx, dl in zip(ia.tolist(), d_local.tolist()):
            if idx in kp_depth[i] and dl > 1e-6:
                num.append(kp_depth[i][idx])
                den.append(dl)
        if len(num) < 5:
            scale = 1.0
            log(f"edge ({i},{i + 1}): <5 shared tracks, scale=1 (weak)")
        else:
            scale = float(np.median(np.asarray(num) / np.asarray(den)))
        # global pose of i+1: x_{i+1} = Rr x_i + scale * tr
        Rw.append(Rr @ Rw[i])
        tw.append(Rr @ tw[i] + scale * tr)
        # Prefer already-known global depths for the forward pass;
        # fall back to this edge's scaled triangulation.
        d_fwd = np.array([kp_depth[i].get(a, dl * scale)
                          for a, dl in zip(ia.tolist(), d_local.tolist())])
        forward_depths(i, ia, ib, d_fwd, Rr, scale * tr, kp_depth[i + 1])

    init_cams6 = np.stack([np.concatenate([_log_so3(R), t])
                           for R, t in zip(Rw, tw)])

    # ---- tracks -> triangulate -> BA ---------------------------------
    Kt = np.tile(K[None], (n, 1, 1))
    recon = reconstruct(kps, matches, Kt, init_cams6.astype(np.float32),
                        min_track_len=2, max_views=args.max_span + 1,
                        ba_iters=args.ba_iters, rounds=2)
    n_tracks = int(recon["point_valid"].sum())
    log(f"{recon['tracks'].num_tracks} tracks "
        f"({n_tracks} valid after BA), cost "
        f"{recon['cost_history'][0]:.1f} -> {recon['cost_history'][-1]:.1f}")

    ate_init = absolute_trajectory_error(init_cams6, gt_cams6)
    ate_ba = absolute_trajectory_error(recon["cams"], gt_cams6)

    # ---- second row: drifty-odometry init, BA must recover ----------
    # The match-chain init above is typically already AT the
    # reprojection floor of this observation graph (measured: BA is a
    # no-op on it), so it cannot demonstrate that BA works. This row
    # starts from a deliberately degraded odometry-style trajectory
    # (the elastic-recovery scenario) and gates on BA pulling it back.
    rng2 = np.random.default_rng(args.seed + 1)
    odo = gt_cams6 + np.concatenate(
        [rng2.normal(0, 0.02, (n, 3)), rng2.normal(0, 0.15, (n, 3))],
        axis=1)
    odo[0] = gt_cams6[0]
    rec2 = reconstruct(kps, matches, Kt, odo.astype(np.float32),
                       min_track_len=2, max_views=args.max_span + 1,
                       ba_iters=args.ba_iters, rounds=3)
    ate_odo = absolute_trajectory_error(odo, gt_cams6)
    ate_odo_ba = absolute_trajectory_error(rec2["cams"], gt_cams6)
    log(f"odometry row: cost {rec2['cost_history'][0]:.1f} -> "
        f"{rec2['cost_history'][-1]:.1f}, ATE {ate_odo['ate_rmse']:.4f} "
        f"-> {ate_odo_ba['ate_rmse']:.4f}")

    # ---- COLMAP export (L6 parity, driven end to end) ----------------
    exp_dir = args.export or tempfile.mkdtemp(prefix="oetr_sfm_")
    names = [f"view_{i:02d}.jpg" for i in range(n)]
    export_colmap(exp_dir, names, np.tile(K[None], (n, 1, 1)), recon)
    export_database(os.path.join(exp_dir, "database.db"), names,
                    np.tile(K[None], (n, 1, 1)), kps, matches)
    ok_export = all(os.path.exists(os.path.join(exp_dir, f))
                    for f in ("cameras.bin", "images.bin", "points3D.bin",
                              "database.db"))

    print(json.dumps({
        "metric": "sfm_ate",
        "n_views": n, "hw": args.hw, "matcher": args.matcher,
        "edges_matched": len(matches),
        "tracks": int(recon["tracks"].num_tracks),
        "tracks_valid": n_tracks,
        "ate_rmse_init": round(ate_init["ate_rmse"], 4),
        "ate_rmse_ba": round(ate_ba["ate_rmse"], 4),
        "rot_err_mean_deg_init": round(ate_init["rot_err_mean_deg"], 4),
        "rot_err_mean_deg_ba": round(ate_ba["rot_err_mean_deg"], 4),
        "ate_rmse_odometry_init": round(ate_odo["ate_rmse"], 4),
        "ate_rmse_odometry_ba": round(ate_odo_ba["ate_rmse"], 4),
        "rot_err_mean_deg_odometry_init":
            round(ate_odo["rot_err_mean_deg"], 4),
        "rot_err_mean_deg_odometry_ba":
            round(ate_odo_ba["rot_err_mean_deg"], 4),
        "ba_beats_init": bool(
            ate_odo_ba["ate_rmse"] < 0.5 * ate_odo["ate_rmse"]
            and ate_ba["ate_rmse"] <= ate_init["ate_rmse"] * 1.05),
        "colmap_export_ok": bool(ok_export),
        "export_dir": exp_dir,
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
