#!/usr/bin/env python
"""Cross-validate our h5 results + metrics against the REFERENCE'S OWN
eval code (closes the "format-compatible, says us" loop).

Flow:
  1. generate non-planar 3-D synthetic scenes with known geometry
     (data/synthetic.generate_scene_3d);
  2. match every pair with SIFT->NN through the REAL benchmark runner
     (pipelines/runner.run_benchmark) which writes per-scene h5 in the
     reference's layout (utils/h5io.py);
  3. score those h5 files TWICE:
       a. with the unmodified reference eval stack — its
          dataloader.megadepth.MegaDepthDataset + torch DataLoader +
          utils.evaluation.validation_error + utils.utils.pose_auc
          (/root/reference/dloc/evaluate/eval_megadepth.py:35-54
          semantics; the loop is replicated here because that file's
          `from parser import arg_parse` can't import on py3.12, and we
          guard per-pair cv2 failures as err=inf for both sides);
       b. with OUR harness (evalx.megadepth.benchmark_results);
  4. print both rows and assert agreement: precision / matching score
     are deterministic epipolar arithmetic and must match to float
     noise; pose AUC uses different RANSACs (cv2's plain E-RANSAC vs
     our LO-RANSAC) so it must agree within a noise budget.

Needs only CPU (torch + cv2 are installed); skimage is stubbed — the
reference imports it at module scope but validation_error never calls it.

Prints one JSON line; exits nonzero on disagreement.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

REFERENCE = "/root/reference"


def load_reference_eval():
    """Import the reference's eval modules with minimal shims."""
    # validation_error only needs cv2/numpy, but the module imports
    # skimage at top level (for unrelated homography helpers).
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sk.transform = types.ModuleType("skimage.transform")
        sys.modules["skimage"] = sk
    for p in (REFERENCE, os.path.join(REFERENCE, "dloc", "evaluate")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from dataloader.megadepth import MegaDepthDataset  # noqa: E402
    from utils.evaluation import validation_error      # noqa: E402
    from utils.utils import pose_auc                   # noqa: E402
    return MegaDepthDataset, validation_error, pose_auc


class SiftNNPipeline:
    """Minimal runner-compatible pipeline: SIFT keypoints + mutual-NN.

    Duck-types the SparsePipeline surface run_benchmark uses (`.cfg`,
    `__call__` returning keypoints0/1, matches0, valid0). Keypoint
    arrays are padded to ``topk`` with valid masks — padding rows are
    excluded from matches, and both eval stacks read the same padded
    keypoints.h5, so the matching-score denominator is identical.
    """

    def __init__(self, cfg, topk: int = 1024, ratio: float = 0.95):
        self.cfg = cfg
        self.topk = topk
        self.ratio = ratio

    def __call__(self, image0, image1, full_hw0, full_hw1,
                 oetr_img0, oetr_img1, scales0, scales1,
                 with_overlap: bool = False):
        import cv2
        import jax.numpy as jnp
        import numpy as np

        from oetr_tpu.models.matchers import nearest_neighbor_match
        from oetr_tpu.models.sift_based import sift_keypoints

        k0s, k1s, m0s, v0s = [], [], [], []
        for i in range(image0.shape[0]):
            g0 = cv2.cvtColor(
                (np.asarray(image0[i]) * 255).astype(np.uint8),
                cv2.COLOR_RGB2GRAY)
            g1 = cv2.cvtColor(
                (np.asarray(image1[i]) * 255).astype(np.uint8),
                cv2.COLOR_RGB2GRAY)
            xy0, _, v0, d0 = sift_keypoints(g0, self.topk,
                                            with_descriptors=True)
            xy1, _, v1, d1 = sift_keypoints(g1, self.topk,
                                            with_descriptors=True)
            m = nearest_neighbor_match(jnp.asarray(d0)[None],
                                       jnp.asarray(d1)[None],
                                       jnp.asarray(v0)[None],
                                       jnp.asarray(v1)[None],
                                       ratio_threshold=self.ratio)
            k0s.append(np.asarray(xy0))
            k1s.append(np.asarray(xy1))
            m0s.append(np.asarray(m["matches0"][0]))
            v0s.append(np.asarray(v0))
        return {"keypoints0": k0s, "keypoints1": k1s,
                "matches0": m0s, "valid0": v0s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--hw", type=int, default=240)
    ap.add_argument("--auc_tol", type=float, default=0.10,
                    help="allowed |AUC diff| (0-1 scale) between the two "
                         "RANSAC protocols")
    args = ap.parse_args()

    import numpy as np
    import torch

    from oetr_tpu.data.synthetic import generate_scene_3d
    from oetr_tpu.evalx import megadepth as our_megadepth
    from oetr_tpu.pipelines import PipelineConfig
    from oetr_tpu.pipelines.runner import run_benchmark

    t0 = time.time()
    hw = args.hw
    root = tempfile.mkdtemp(prefix="oetr_crosscheck_")
    ds_dir = os.path.join(root, "ds")
    scene_dir = os.path.join(ds_dir, "synth")
    generate_scene_3d(scene_dir, n_pairs=args.pairs, image_hw=hw, seed=21,
                      rot_deg=8.0, tilt_deg=5.0, scale_range=(1.0, 1.4),
                      illum_range=(0.85, 1.15))

    # Eval-format pair list (dloc/evaluate/dataloader/megadepth.py:17-27):
    # name0 name1 K0(9) K1(9) T_0to1(16) bbox0(4 int) bbox1(4 int).
    from oetr_tpu.data.pairs import load_pairs
    recs = load_pairs(os.path.join(scene_dir, "pairs.txt"))
    pairs_txt = os.path.join(root, "eval_pairs.txt")
    with open(pairs_txt, "w") as f:
        for r in recs:
            T_0to1 = r.pose2 @ np.linalg.inv(r.pose1)
            fields = ([f"synth/{r.image_path1}", f"synth/{r.image_path2}"]
                      + [str(x) for x in r.K1.reshape(-1)]
                      + [str(x) for x in r.K2.reshape(-1)]
                      + [str(x) for x in T_0to1.reshape(-1)]
                      + ["0", "0", str(hw), str(hw)] * 2)
            f.write(" ".join(fields) + "\n")

    # Real runner -> reference-format h5.
    cfg = PipelineConfig(canvas_hw=(hw, hw), oetr_hw=(64, 64))
    results = os.path.join(root, "results", "sift-nn")
    stats = run_benchmark(SiftNNPipeline(cfg), pairs_txt, ds_dir, results,
                          batch_size=8, with_overlap=False, resize_max=None,
                          pairwise=True)

    # --- (a) the reference's own eval code reads our h5 ------------------
    MegaDepthDataset, ref_validation_error, ref_pose_auc = \
        load_reference_eval()
    loader = torch.utils.data.DataLoader(
        MegaDepthDataset(pairs_txt, results, pairwise=True), num_workers=0)
    pose_errors, precisions, mscores = [], [], []
    for data in loader:
        try:
            res = ref_validation_error(data)
            pose_errors.append(float(np.maximum(res["error_t"],
                                                res["error_R"])))
            precisions.append(float(res["precision"]))
            mscores.append(float(res["matching_score"]))
        except (AssertionError, ValueError):
            # cv2.findEssentialMat returned None (degenerate pair):
            # the reference asserts; count as failed like <5 matches.
            pose_errors.append(np.inf)
            precisions.append(0.0)
            mscores.append(0.0)
    ref_aucs = [100.0 * a for a in ref_pose_auc(pose_errors, [5, 10, 20])]
    ref_prec = 100.0 * float(np.mean(precisions))
    ref_ms = 100.0 * float(np.mean(mscores))

    # --- (b) our harness reads the same h5 -------------------------------
    our_aucs, our_prec, our_ms = our_megadepth.benchmark_results(
        pairs_txt, results, pairwise=True)

    d_auc = max(abs(a - b) / 100.0 for a, b in zip(ref_aucs, our_aucs))
    d_prec = abs(ref_prec - our_prec) / 100.0
    d_ms = abs(ref_ms - our_ms) / 100.0
    ok = (d_auc <= args.auc_tol and d_prec <= 5e-3 and d_ms <= 5e-3)
    print(json.dumps({
        "metric": "reference_eval_crosscheck",
        "pairs": args.pairs, "hw": hw,
        "matches_per_pair": round(stats["matches_per_pair"], 1),
        "reference_eval": {"aucs": [round(a, 2) for a in ref_aucs],
                           "precision": round(ref_prec, 2),
                           "matching_score": round(ref_ms, 3)},
        "our_eval": {"aucs": [round(a, 2) for a in our_aucs],
                     "precision": round(our_prec, 2),
                     "matching_score": round(our_ms, 3)},
        "max_auc_diff": round(d_auc, 4),
        "precision_diff": round(d_prec, 6),
        "agree": ok,
        "wall_s": round(time.time() - t0, 1),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
