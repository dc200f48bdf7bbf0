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

# How far our pose AUC may sit ABOVE the reference's cv2-RANSAC AUC
# before the crosscheck fails (absolute AUC fraction). The measured
# legitimate estimator lift is ~0.19-0.20 at AUC@5 (BASELINE.md §5);
# 0.35 leaves headroom for RANSAC noise while still catching
# metric-inflation bugs (which overshoot toward ~1 - ref).
UPPER_AUC_BUDGET = 0.35

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

REFERENCE = "/root/reference"


def _import_reference_modules(*module_names: str):
    """Import reference eval modules via their proper ``dloc.*`` package
    path with /root/reference APPENDED to sys.path for the duration of
    the import only.

    Advisor r3 finding: the previous version prepended the reference
    tree AND its dloc/evaluate dir to sys.path permanently and imported
    generically-named top-level modules (``utils``, ``dataloader``) — in
    a shared pytest process any later `import utils` would resolve into
    the untrusted reference tree. The ``dloc`` package name is unique
    and its __init__ files are empty, so the package-path import is
    collision-free; the sys.path entry is removed afterwards.
    """
    import importlib

    # validation_error only needs cv2/numpy, but the module imports
    # skimage at top level (for unrelated homography helpers).
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sk.transform = types.ModuleType("skimage.transform")
        sys.modules["skimage"] = sk
    added = REFERENCE not in sys.path
    if added:
        sys.path.append(REFERENCE)
    try:
        return tuple(importlib.import_module(m) for m in module_names)
    finally:
        if added:
            sys.path.remove(REFERENCE)


def load_reference_eval():
    """(MegaDepthDataset, validation_error, pose_auc) from the reference."""
    md, ev, ut = _import_reference_modules(
        "dloc.evaluate.dataloader.megadepth",
        "dloc.evaluate.utils.evaluation",
        "dloc.evaluate.utils.utils")
    return md.MegaDepthDataset, ev.validation_error, ut.pose_auc


def load_reference_eval_imc():
    """(IMCDataset, validation_error, pose_auc, pose_mAA)."""
    im, ev, ut = _import_reference_modules(
        "dloc.evaluate.dataloader.imc",
        "dloc.evaluate.utils.evaluation",
        "dloc.evaluate.utils.utils")
    return im.IMCDataset, ev.validation_error, ut.pose_auc, ut.pose_mAA


def load_reference_eval_hpatches():
    """(HpatchesDataset, h_evaluate)."""
    hp, ev = _import_reference_modules(
        "dloc.evaluate.dataloader.hpatches",
        "dloc.evaluate.utils.evaluation")
    return hp.HpatchesDataset, ev.h_evaluate


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


def _sift_nn_pair(g0, g1, topk=1024, ratio=0.95):
    """SIFT+mutual-NN on two grayscale uint8 images -> (k0, k1, m0, v0)."""
    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints

    xy0, _, v0, d0 = sift_keypoints(g0, topk, with_descriptors=True)
    xy1, _, v1, d1 = sift_keypoints(g1, topk, with_descriptors=True)
    m = nearest_neighbor_match(jnp.asarray(d0)[None], jnp.asarray(d1)[None],
                               jnp.asarray(v0)[None], jnp.asarray(v1)[None],
                               ratio_threshold=ratio)
    return (np.asarray(xy0), np.asarray(xy1),
            np.asarray(m["matches0"][0]), np.asarray(v0))


def _ref_pair_metrics_fallback(data):
    """precision/matching-score via the reference's own epipolar code for
    pairs where its validation_error dies in `assert E is not None`
    (degenerate essential matrix with >= 5 matches) — the reference
    computes precision BEFORE pose estimation, so the deterministic
    metrics are still defined; only the pose error is inf."""
    import numpy as np

    (ev,) = _import_reference_modules("dloc.evaluate.utils.evaluation")
    kpts0 = data["kpts0"][0].float().cpu().numpy()
    kpts1 = data["kpts1"][0].float().cpu().numpy()
    matches = data["matches"][0].cpu().numpy()
    mk0 = kpts0[matches[0]]
    mk1 = kpts1[matches[1]]
    K0 = data["intrinsics0"][0].cpu().numpy()
    K1 = data["intrinsics1"][0].cpu().numpy()
    T = data["pose"][0].reshape(4, 4).cpu().numpy()
    if len(mk0) == 0:
        return 0.0, 0.0
    epi = ev.compute_epipolar_error(mk0, mk1, T, K0, K1)
    correct = epi < 5e-4
    prec = float(np.mean(correct)) if len(correct) else 0.0
    ms = float(np.sum(correct)) / len(kpts0) if len(kpts0) else 0.0
    return prec, ms


def run_imc_crosscheck(args, root):
    """IMC protocol: our h5 + pairs scored by the reference's own
    IMCDataset/validation_error/pose_auc/pose_mAA vs evalx.imc.

    Ref: /root/reference/dloc/evaluate/eval_imc.py:92-123 (the loop is
    replicated because the file's `from parser import arg_parse` can't
    import on py3.12).
    """
    import numpy as np
    import torch

    from oetr_tpu.data.pairs import load_pairs
    from oetr_tpu.data.synthetic import generate_scene_3d
    from oetr_tpu.evalx import imc as our_imc
    from oetr_tpu.pipelines import PipelineConfig
    from oetr_tpu.pipelines.runner import run_benchmark

    hw = args.hw
    ds_dir = os.path.join(root, "imc_ds")
    dataset = "phototourism-val"
    lines = []
    for scene, seed in (("synthA", 31), ("synthB", 32)):
        sdir = os.path.join(ds_dir, dataset, scene)
        generate_scene_3d(sdir, n_pairs=max(args.pairs // 2, 4),
                          image_hw=hw, seed=seed, rot_deg=8.0, tilt_deg=5.0,
                          scale_range=(1.0, 1.4), illum_range=(0.85, 1.15))
        for r in load_pairs(os.path.join(sdir, "pairs.txt")):
            T = r.pose2 @ np.linalg.inv(r.pose1)
            lines.append(" ".join(
                [f"{dataset}/{scene}/{r.image_path1}",
                 f"{dataset}/{scene}/{r.image_path2}"]
                + [str(x) for x in r.K1.reshape(-1)]
                + [str(x) for x in r.K2.reshape(-1)]
                + [str(x) for x in T.reshape(-1)]))
    pairs_txt = os.path.join(root, "imc_pairs.txt")
    with open(pairs_txt, "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg = PipelineConfig(canvas_hw=(hw, hw), oetr_hw=(64, 64))
    results = os.path.join(root, "results", "sift-imc")
    run_benchmark(SiftNNPipeline(cfg), pairs_txt, ds_dir, results,
                  batch_size=8, with_overlap=False, resize_max=None,
                  pairwise=False)
    # The reference loader reads results/<data_name>/<scene>; our runner
    # writes results/<scene> (scene = parts[1]). A self-symlink makes
    # both resolve to the same files.
    link = os.path.join(results, dataset)
    if not os.path.exists(link):
        os.symlink(".", link)

    IMCDataset, ref_validation_error, ref_pose_auc, ref_pose_mAA = \
        load_reference_eval_imc()
    loader = torch.utils.data.DataLoader(
        IMCDataset(pairs_txt, results, pairwise=False), num_workers=0)
    errs, precs, mss = [], [], []
    for data in loader:
        try:
            res = ref_validation_error(data)
            errs.append(float(np.maximum(res["error_t"], res["error_R"])))
            precs.append(float(res["precision"]))
            mss.append(float(res["matching_score"]))
        except (AssertionError, ValueError):
            prec, ms = _ref_pair_metrics_fallback(data)
            errs.append(np.inf)
            precs.append(prec)
            mss.append(ms)
    ref_row = {
        "aucs": [round(100.0 * a, 2) for a in ref_pose_auc(errs, [5, 10, 20])],
        "precision": round(100.0 * float(np.mean(precs)), 2),
        "matching_score": round(100.0 * float(np.mean(mss)), 3),
        "mAA@10": round(100.0 * float(ref_pose_mAA(errs)), 2),
    }

    datasets, aucs, prec, ms, mAA = our_imc.benchmark_results(
        pairs_txt, results, pairwise=False)
    ti = datasets.index("total")
    our_row = {"aucs": [round(a, 2) for a in aucs[ti]],
               "precision": round(prec[ti], 2),
               "matching_score": round(ms[ti], 3),
               "mAA@10": round(mAA[ti], 2)}

    # Asymmetric budgets (ADVICE r4): tight below cv2 (falling under the
    # reference estimator is a regression), generous above it (ours
    # measurably beats cv2 by up to ~20 points — but an AUC *inflation*
    # bug would blow well past UPPER_AUC_BUDGET and still fail).
    d_auc = max((a - b) / 100.0
                for a, b in zip(ref_row["aucs"], our_row["aucs"]))
    d_auc_up = max((b - a) / 100.0
                   for a, b in zip(ref_row["aucs"], our_row["aucs"]))
    d_mAA = (ref_row["mAA@10"] - our_row["mAA@10"]) / 100.0
    ok = bool(d_auc <= args.auc_tol and d_mAA <= args.auc_tol
              and d_auc_up <= UPPER_AUC_BUDGET
              and abs(ref_row["precision"] - our_row["precision"]) < 0.5
              and abs(ref_row["matching_score"] - our_row["matching_score"])
              < 0.5)
    return {"reference_eval": ref_row, "our_eval": our_row,
            "max_auc_diff": round(d_auc, 4), "mAA_diff": round(d_mAA, 4),
            "agree": ok}


def run_hpatches_crosscheck(args, root):
    """HPatches protocol: synthetic homography sequences scored by the
    reference's HpatchesDataset + h_evaluate MMA loop vs evalx.hpatches.

    MMA is deterministic (no RANSAC) -> exact agreement required.
    Ref: /root/reference/dloc/evaluate/eval_hpatches.py:58-106.
    """
    import cv2
    import numpy as np
    import torch

    from oetr_tpu.data.synthetic import _texture
    from oetr_tpu.evalx import hpatches as our_hpatches
    from oetr_tpu.training.superpoint import random_homography
    from oetr_tpu.utils.h5io import save_scene_results

    hw = args.hw
    rng = np.random.default_rng(77)
    ds_dir = os.path.join(root, "hp_ds")
    results = os.path.join(root, "results", "sift-hp")
    pair_lines = []
    n_imgs = 3                       # pairs 1-2, 1-3 per sequence
    for seq_i in range(args.hp_seqs):
        for kind in ("i", "v"):
            seq = f"{kind}_synth{seq_i}"
            sdir = os.path.join(ds_dir, seq)
            os.makedirs(sdir, exist_ok=True)
            base = _texture(rng, hw, hw)
            cv2.imwrite(os.path.join(sdir, "1.ppm"), base[..., ::-1])
            imgs = {1: base}
            for j in range(2, n_imgs + 1):
                if kind == "v":
                    H = random_homography(rng, (hw, hw),
                                          max_rot_deg=15.0,
                                          scale_range=(0.8, 1.25))
                    warped = cv2.warpPerspective(base, H, (hw, hw))
                else:
                    H = np.eye(3)
                    gain = float(rng.uniform(0.7, 1.3))
                    warped = np.clip(base.astype(np.float32) * gain,
                                     0, 255).astype(np.uint8)
                cv2.imwrite(os.path.join(sdir, f"{j}.ppm"),
                            warped[..., ::-1])
                np.savetxt(os.path.join(sdir, f"H_1_{j}"), H)
                imgs[j] = warped
                pair_lines.append(f"{seq}/1.ppm {seq}/{j}.ppm")
            kpts, matches = {}, {}
            grays = {j: cv2.cvtColor(im, cv2.COLOR_RGB2GRAY)
                     for j, im in imgs.items()}
            for j in range(2, n_imgs + 1):
                k0, k1, m0, v0 = _sift_nn_pair(grays[1], grays[j])
                kpts.setdefault("1", k0)
                kpts[str(j)] = k1
                sel = (m0 > -1) & v0
                matches[f"1-{j}"] = np.stack(
                    [np.nonzero(sel)[0], m0[sel]]).astype(np.int64)
            save_scene_results(results, seq, kpts, matches)
    pairs_txt = os.path.join(root, "hp_pairs.txt")
    with open(pairs_txt, "w") as f:
        f.write("\n".join(pair_lines) + "\n")

    HpatchesDataset, ref_h_evaluate = load_reference_eval_hpatches()
    loader = torch.utils.data.DataLoader(
        HpatchesDataset(pairs_txt, ds_dir, results, pairwise=False),
        num_workers=0)
    rng_thr = np.arange(1, 16)
    i_err = {t: 0.0 for t in rng_thr}
    v_err = {t: 0.0 for t in rng_thr}
    n_i = n_v = 0
    for data in loader:
        dist = ref_h_evaluate(data["H_gt"][0], data["kpts0"][0],
                              data["kpts1"][0],
                              data["matches"][0].transpose(1, 0))
        dist = np.asarray(dist)
        if dist.shape[0] == 0:
            dist = np.array([float("inf")])
        for t in rng_thr:
            if data["seq_name"][0][0] == "i":
                i_err[t] += np.mean(dist <= t)
            else:
                v_err[t] += np.mean(dist <= t)
        if data["seq_name"][0][0] == "i":
            n_i += 1
        else:
            n_v += 1
    ref_mma = {"illumination": {int(t): i_err[t] / max(n_i, 1)
                                for t in rng_thr},
               "viewpoint": {int(t): v_err[t] / max(n_v, 1)
                             for t in rng_thr}}

    # Our harness reads the same h5s.
    import h5py
    recs = []
    for line in pair_lines:
        nm0, nm1 = line.split()
        seq = nm0.split("/")[0]
        j = nm1.split("/")[-1][0]
        with h5py.File(os.path.join(results, seq, "keypoints.h5"),
                       "r") as f:
            k0 = f["1"][()]
            k1 = f[j][()]
        with h5py.File(os.path.join(results, seq, "matches.h5"), "r") as f:
            m = f[f"1-{j}"][()]
        recs.append({"seq_name": seq,
                     "H_gt": np.loadtxt(os.path.join(ds_dir, seq,
                                                     f"H_1_{j}")),
                     "kpts0": k0, "kpts1": k1, "matches": m.T})
    our_mma = our_hpatches.benchmark_results(recs)

    diffs = [abs(ref_mma[k][t] - our_mma[k][t])
             for k in ("illumination", "viewpoint") for t in (1, 3, 5, 10)]
    ok = bool(max(diffs) < 1e-9)
    summarize = lambda d: {t: round(d[t], 4) for t in (1, 3, 5, 10)}  # noqa: E731
    return {"reference_eval": {k: summarize(ref_mma[k])
                               for k in ("illumination", "viewpoint")},
            "our_eval": {k: summarize(our_mma[k])
                         for k in ("illumination", "viewpoint")},
            "max_mma_diff": float(max(diffs)), "agree": ok}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=24)
    ap.add_argument("--hw", type=int, default=240)
    ap.add_argument("--hp_seqs", type=int, default=3,
                    help="synthetic HPatches sequences per i/v split")
    ap.add_argument("--protocols", type=str,
                    default="megadepth,imc,hpatches")
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
    protocols = [p.strip() for p in args.protocols.split(",") if p.strip()]
    root = tempfile.mkdtemp(prefix="oetr_crosscheck_")
    result: dict = {"metric": "reference_eval_crosscheck",
                    "pairs": args.pairs, "hw": hw,
                    "protocols": protocols}
    all_ok = True

    if "imc" in protocols:
        imc_res = run_imc_crosscheck(args, root)
        result["imc"] = imc_res
        all_ok &= imc_res["agree"]
        print(f"# imc done agree={imc_res['agree']} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    if "hpatches" in protocols:
        hp_res = run_hpatches_crosscheck(args, root)
        result["hpatches"] = hp_res
        all_ok &= hp_res["agree"]
        print(f"# hpatches done agree={hp_res['agree']} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    if "megadepth" not in protocols:
        result["agree"] = bool(all_ok)
        result["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(result))
        sys.exit(0 if all_ok else 1)

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
            # cv2.findEssentialMat returned None (degenerate pair): the
            # reference asserts mid-function; pose err is inf but the
            # deterministic metrics are recomputed with its own code.
            prec, ms = _ref_pair_metrics_fallback(data)
            pose_errors.append(np.inf)
            precisions.append(prec)
            mscores.append(ms)
    ref_aucs = [100.0 * a for a in ref_pose_auc(pose_errors, [5, 10, 20])]
    ref_prec = 100.0 * float(np.mean(precisions))
    ref_ms = 100.0 * float(np.mean(mscores))

    # --- (b) our harness reads the same h5 -------------------------------
    our_aucs, our_prec, our_ms = our_megadepth.benchmark_results(
        pairs_txt, results, pairwise=True)

    # Asymmetric AUC budgets: the two RANSACs differ, and ours (5-point
    # + DEGENSAC + MSAC LO, round 4) measurably exceeds the reference's
    # cv2 path, so below-cv2 is tight (args.auc_tol) while above-cv2
    # gets a generous-but-finite budget (UPPER_AUC_BUDGET) — a metric-
    # inflation bug would overshoot it; the deterministic metrics are
    # exact-checked either way.
    d_auc = max((a - b) / 100.0 for a, b in zip(ref_aucs, our_aucs))
    d_auc_up = max((b - a) / 100.0 for a, b in zip(ref_aucs, our_aucs))
    d_prec = abs(ref_prec - our_prec) / 100.0
    d_ms = abs(ref_ms - our_ms) / 100.0
    ok = bool(d_auc <= args.auc_tol and d_auc_up <= UPPER_AUC_BUDGET
              and d_prec <= 5e-3 and d_ms <= 5e-3)
    all_ok &= ok
    result["megadepth"] = {
        "matches_per_pair": round(stats["matches_per_pair"], 1),
        "reference_eval": {"aucs": [round(a, 2) for a in ref_aucs],
                           "precision": round(ref_prec, 2),
                           "matching_score": round(ref_ms, 3)},
        "our_eval": {"aucs": [round(a, 2) for a in our_aucs],
                     "precision": round(our_prec, 2),
                     "matching_score": round(our_ms, 3)},
        "max_auc_diff": round(float(d_auc), 4),
        "precision_diff": round(float(d_prec), 6),
        "agree": ok,
    }
    result["agree"] = bool(all_ok)
    result["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(result))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
