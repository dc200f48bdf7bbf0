"""The reference's OWN eval code reads h5 written by our runner.

Closes the format/metric loop with the reference's actual code
(dloc/evaluate/dataloader + utils/evaluation + utils/utils.pose_auc)
instead of our re-implementation reading its own output. Core
assertion: precision / matching score — deterministic epipolar
arithmetic with no RANSAC — must agree to float noise; pose AUC (two
different RANSAC estimators) within a loose budget.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_reference_eval_reads_our_h5(tmp_path):
    import torch

    from oetr_tpu.data.pairs import load_pairs
    from oetr_tpu.data.synthetic import generate_scene_3d
    from oetr_tpu.evalx import megadepth as our_megadepth
    from oetr_tpu.pipelines import PipelineConfig
    from oetr_tpu.pipelines.runner import run_benchmark

    spec = importlib.util.spec_from_file_location(
        "crosscheck", os.path.join(os.path.dirname(__file__), "..",
                                   "scripts", "crosscheck_reference_eval.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    hw, n = 200, 8
    ds_dir = str(tmp_path / "ds")
    generate_scene_3d(os.path.join(ds_dir, "synth"), n_pairs=n, image_hw=hw,
                      seed=5, rot_deg=6.0, tilt_deg=4.0,
                      scale_range=(1.0, 1.3), illum_range=(0.9, 1.1))
    recs = load_pairs(os.path.join(ds_dir, "synth", "pairs.txt"))
    assert recs, "no valid pairs generated"
    pairs_txt = str(tmp_path / "pairs.txt")
    with open(pairs_txt, "w") as f:
        for r in recs:
            T = r.pose2 @ np.linalg.inv(r.pose1)
            fields = ([f"synth/{r.image_path1}", f"synth/{r.image_path2}"]
                      + [str(x) for x in r.K1.reshape(-1)]
                      + [str(x) for x in r.K2.reshape(-1)]
                      + [str(x) for x in T.reshape(-1)]
                      + ["0", "0", str(hw), str(hw)] * 2)
            f.write(" ".join(fields) + "\n")

    cfg = PipelineConfig(canvas_hw=(hw, hw), oetr_hw=(64, 64))
    results = str(tmp_path / "results")
    run_benchmark(cc.SiftNNPipeline(cfg, topk=512), pairs_txt, ds_dir,
                  results, batch_size=4, with_overlap=False,
                  resize_max=None, pairwise=True)

    MegaDepthDataset, ref_validation_error, ref_pose_auc = \
        cc.load_reference_eval()
    loader = torch.utils.data.DataLoader(
        MegaDepthDataset(pairs_txt, results, pairwise=True), num_workers=0)
    errs, precs, mss = [], [], []
    for data in loader:
        try:
            res = ref_validation_error(data)
            errs.append(float(np.maximum(res["error_t"], res["error_R"])))
            precs.append(float(res["precision"]))
            mss.append(float(res["matching_score"]))
        except (AssertionError, ValueError):
            errs.append(np.inf)
            precs.append(0.0)
            mss.append(0.0)
    ref_aucs = [100.0 * a for a in ref_pose_auc(errs, [5, 10, 20])]
    ref_prec = 100.0 * float(np.mean(precs))
    ref_ms = 100.0 * float(np.mean(mss))

    our_aucs, our_prec, our_ms = our_megadepth.benchmark_results(
        pairs_txt, results, pairwise=True)

    # Deterministic metrics: exact agreement (same h5, same arithmetic).
    assert abs(ref_prec - our_prec) < 1e-6, (ref_prec, our_prec)
    assert abs(ref_ms - our_ms) < 1e-6, (ref_ms, our_ms)
    # Pose AUC: different RANSACs; 8 pairs => 12.5 pts per pair rank.
    assert max(abs(a - b) for a, b in zip(ref_aucs, our_aucs)) <= 30.0, (
        ref_aucs, our_aucs)


@pytest.mark.slow
def test_reference_eval_reads_our_h5_imc_hpatches(tmp_path):
    """Round-4 extension (VERDICT r3 next #8): the IMC and HPatches
    protocols cross-checked with the reference's own dataloaders and
    metric code. Deterministic quantities (precision, matching score,
    MMA — no RANSAC anywhere) must agree exactly; IMC pose AUC gets a
    loose budget for the two RANSAC estimators on few pairs."""
    import argparse

    spec = importlib.util.spec_from_file_location(
        "crosscheck2", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "crosscheck_reference_eval.py"))
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    args = argparse.Namespace(pairs=8, hw=200, hp_seqs=2, auc_tol=0.5)
    root = str(tmp_path)

    imc = cc.run_imc_crosscheck(args, root)
    assert abs(imc["reference_eval"]["precision"]
               - imc["our_eval"]["precision"]) < 1e-6
    assert abs(imc["reference_eval"]["matching_score"]
               - imc["our_eval"]["matching_score"]) < 1e-6

    hp = cc.run_hpatches_crosscheck(args, root)
    assert hp["max_mma_diff"] < 1e-9, hp
    assert hp["agree"]
