#!/usr/bin/env python
"""Per-pair A/B of our XLA LO-RANSAC vs cv2.findEssentialMat+recoverPose
on identical SIFT+NN matches (the round-4 IMC crosscheck showed a 13-pt
pose-AUC@5 gap, reference eval 33.8 vs our harness 20.4, with precision
agreeing exactly — i.e. the matches are the same and the estimator is
the difference). Ref: /root/reference/dloc/evaluate/utils/evaluation.py:
209-240 (the cv2 path being compared against).

Prints a per-pair table (max angular error ours vs cv2, inlier counts)
plus aggregate AUCs, and optionally sweeps estimator knobs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--hw", type=int, default=240)
    ap.add_argument("--rot", type=float, default=8.0)
    ap.add_argument("--tilt", type=float, default=5.0)
    ap.add_argument("--scale", type=float, default=1.4)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--hyps", type=int, default=512)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--thresh", type=float, default=1.0)
    args = ap.parse_args()

    import tempfile

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.data.pairs import load_pairs
    from oetr_tpu.data.synthetic import generate_scene_3d
    from oetr_tpu.evalx.metrics import pose_auc
    from oetr_tpu.evalx.twoview import validation_error
    from oetr_tpu.geometry.epipolar import pose_error as pose_error_fn
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints

    root = tempfile.mkdtemp(prefix="ransac_gap_")
    recs = []
    for scene, seed in (("a", args.seed), ("b", args.seed + 1)):
        sdir = os.path.join(root, scene)
        generate_scene_3d(sdir, n_pairs=max(args.pairs // 2, 4),
                          image_hw=args.hw, seed=seed, rot_deg=args.rot,
                          tilt_deg=args.tilt, scale_range=(1.0, args.scale),
                          illum_range=(0.85, 1.15))
        for r in load_pairs(os.path.join(sdir, "pairs.txt")):
            recs.append((sdir, r))

    def gray(path):
        return cv2.imread(path, cv2.IMREAD_GRAYSCALE)

    rows = []
    errs_ours, errs_cv2 = [], []
    for sdir, r in recs[:args.pairs]:
        g0 = gray(os.path.join(sdir, r.image_path1))
        g1 = gray(os.path.join(sdir, r.image_path2))
        xy0, _, v0, d0 = sift_keypoints(g0, 1024, with_descriptors=True)
        xy1, _, v1, d1 = sift_keypoints(g1, 1024, with_descriptors=True)
        m = nearest_neighbor_match(jnp.asarray(d0)[None],
                                   jnp.asarray(d1)[None],
                                   jnp.asarray(v0)[None],
                                   jnp.asarray(v1)[None],
                                   ratio_threshold=0.95)
        m0 = np.asarray(m["matches0"][0])
        sel = (m0 > -1) & v0
        matches = np.stack([np.nonzero(sel)[0], m0[sel]])
        T = r.pose2 @ np.linalg.inv(r.pose1)
        mk0 = xy0[matches[0]].astype(np.float64)
        mk1 = xy1[matches[1]].astype(np.float64)

        # ours (same call path as the harness)
        res = validation_error(xy0, xy1, matches, r.K1, r.K2, T,
                               thresh_px=args.thresh,
                               num_hypotheses=args.hyps,
                               lo_candidates=args.lo)
        e_ours = max(res["error_t"], res["error_R"])

        # cv2 reference path (evaluation.py:209-240 semantics)
        if len(mk0) >= 5:
            f_mean = (r.K1[0, 0] + r.K2[1, 1] + r.K1[0, 0]
                      + r.K2[1, 1]) / 4.0
            norm_thresh = args.thresh / f_mean
            p0 = (mk0 - r.K1[[0, 1], [2, 2]]) / r.K1[[0, 1], [0, 1]]
            p1 = (mk1 - r.K2[[0, 1], [2, 2]]) / r.K2[[0, 1], [0, 1]]
            E, mask = cv2.findEssentialMat(
                p0, p1, np.eye(3), threshold=norm_thresh,
                prob=0.99999, method=cv2.RANSAC)
            e_cv = np.inf
            n_in_cv = 0
            if E is not None:
                best = 0
                for i in range(0, E.shape[0], 3):
                    n, R, t, _ = cv2.recoverPose(
                        E[i:i + 3], p0, p1, np.eye(3), 1e9, mask=mask)
                    if n > best:
                        best = n
                        et, eR = pose_error_fn(jnp.asarray(T),
                                               jnp.asarray(R),
                                               jnp.asarray(t[:, 0]))
                        e_cv = max(float(et), float(eR))
                        n_in_cv = int(n)
        else:
            e_cv = np.inf
            n_in_cv = 0

        errs_ours.append(e_ours)
        errs_cv2.append(e_cv)
        rows.append({"n_matches": int(matches.shape[1]),
                     "ours": round(float(e_ours), 2),
                     "cv2": round(float(e_cv), 2),
                     "n_inl_ours": int(np.asarray(res["inliers"]).sum()),
                     "n_inl_cv2": n_in_cv})

    for row in rows:
        flag = ""
        if row["ours"] > 5 >= row["cv2"]:
            flag = "  <-- we lose @5"
        elif row["cv2"] > 5 >= row["ours"]:
            flag = "  <-- we win @5"
        print(f"# {json.dumps(row)}{flag}", file=sys.stderr)

    auc_ours = [round(100 * a, 2) for a in pose_auc(errs_ours, [5, 10, 20])]
    auc_cv2 = [round(100 * a, 2) for a in pose_auc(errs_cv2, [5, 10, 20])]
    print(json.dumps({"metric": "ransac_gap", "pairs": len(rows),
                      "auc_ours": auc_ours, "auc_cv2": auc_cv2,
                      "hyps": args.hyps, "thresh_px": args.thresh}))


if __name__ == "__main__":
    main()
