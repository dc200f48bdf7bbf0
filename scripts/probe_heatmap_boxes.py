#!/usr/bin/env python
"""Eval-only probe: decode overlap boxes from the heatmap instead of the
tlbr size head, on an existing A/B checkpoint.

Round-3 diagnosis (BASELINE.md §3): after dense heatmap supervision the
trained OETR's heatmaps CONCENTRATE on hard scale pairs, but the tlbr
size head stays saturated at full frame — so predicted boxes hedge even
though localization information exists. This probe tests the cheap fix:
derive boxes from heatmap mass quantiles (geometry.boxes.
boxes_from_prob_map) and compare mIoU vs the GT boxes and vs the tlbr
head, per quantile setting; with --full it then runs the complete pose
A/B (SIFT->NN->LO-RANSAC, reference protocol) on the best variant.

Usage:
  JAX_PLATFORMS=cpu python scripts/probe_heatmap_boxes.py \
      --ckpt_dir .ckpt_ab_d192_scratch --step 4000 \
      --data_dir /tmp/oetr_ab_s8wfdtfr [--full]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
            exist_ok=True)
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                 ".jax_cache")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default=".ckpt_ab_d192_scratch")
    ap.add_argument("--step", type=int, default=4000)
    ap.add_argument("--data_dir", default="/tmp/oetr_ab_s8wfdtfr")
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--d_model", type=int, default=192)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--full", action="store_true",
                    help="also run the SIFT pose A/B on the best variant")
    ap.add_argument("--topk", type=int, default=1024)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.geometry.boxes import (bbox_overlaps_aligned,
                                         boxes_from_prob_map)
    from oetr_tpu.training import create_train_state
    from oetr_tpu.training.train import load_checkpoint

    t0 = time.time()
    hw = args.hw
    tokens = hw // 32
    model_cfg = OETRConfig(
        backbone=BackboneConfig(depth=args.depth, stop_layer="layer3",
                                last_layer=256 if args.depth == 18 else 1024),
        neck=NeckConfig(d_model=args.d_model, nhead=8,
                        num_layers=args.layers, num_decoder_layers=2,
                        max_shape=(tokens, tokens)))
    model, state, _ = create_train_state(model_cfg, TrainConfig(),
                                         jax.random.key(0), (hw, hw))
    state = load_checkpoint(os.path.abspath(args.ckpt_dir), args.step, state)
    print(f"# loaded {args.ckpt_dir}/step_{args.step} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    val_txt = os.path.join(args.data_dir, "val", "pairs.txt")
    val_ds = MegaDepthPairsDataset(os.path.join(args.data_dir, "val"),
                                   val_txt, image_size=(hw, hw), train=False)
    items = [val_ds[i] for i in range(len(val_ds))]
    img1 = jnp.asarray(np.stack([it["image1"] for it in items]))
    img2 = jnp.asarray(np.stack([it["image2"] for it in items]))
    gt1 = np.stack([it["overlap_box1"] for it in items]).astype(np.float64)
    gt2 = np.stack([it["overlap_box2"] for it in items]).astype(np.float64)

    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b, deterministic=True))
    outs = []
    for i in range(0, len(items), 8):
        outs.append(jax.tree.map(np.asarray,
                                 fwd(state.params, img1[i:i + 8],
                                     img2[i:i + 8])))
    out = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    print(f"# forward done ({time.time()-t0:.0f}s)", file=sys.stderr,
          flush=True)

    def miou(a, b):
        return float(np.mean(np.asarray(bbox_overlaps_aligned(
            jnp.asarray(a), jnp.asarray(b)))))

    rows = {"tlbr_head": {
        "miou1": round(miou(out["pred_bbox1"], gt1), 4),
        "miou2": round(miou(out["pred_bbox2"], gt2), 4)}}
    best_q, best_miou = None, -1.0
    for q in (0.02, 0.05, 0.10, 0.15, 0.20):
        b1 = np.asarray(boxes_from_prob_map(
            jnp.asarray(out["prob_map1"]), tokens, tokens, (hw, hw), q))
        b2 = np.asarray(boxes_from_prob_map(
            jnp.asarray(out["prob_map2"]), tokens, tokens, (hw, hw), q))
        m1, m2 = miou(b1, gt1), miou(b2, gt2)
        rows[f"heatmap_q{q}"] = {"miou1": round(m1, 4),
                                 "miou2": round(m2, 4)}
        if (m1 + m2) / 2 > best_miou:
            best_miou, best_q = (m1 + m2) / 2, q
    # Context row: full-frame hedge (what the tlbr head emits).
    full = np.tile([0, 0, hw, hw], (len(items), 1)).astype(np.float64)
    rows["full_frame"] = {"miou1": round(miou(full, gt1), 4),
                          "miou2": round(miou(full, gt2), 4)}

    result = {"metric": "heatmap_box_probe", "ckpt": args.ckpt_dir,
              "step": args.step, "best_q": best_q,
              "best_miou": round(best_miou, 4), **rows}

    if args.full:
        import cv2

        from oetr_tpu.evalx.metrics import pose_auc
        from oetr_tpu.evalx.twoview import validation_error
        from oetr_tpu.models.matchers import nearest_neighbor_match
        from oetr_tpu.models.sift_based import sift_keypoints
        from oetr_tpu.ops.warp import crop_resize_batch, unwarp_keypoints

        def clamp_boxes(b):
            b = np.asarray(b, np.float64).copy()
            b[:, 0::2] = np.clip(b[:, 0::2], 0, hw)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, hw)
            bad = ((b[:, 2] - b[:, 0]) < 16) | ((b[:, 3] - b[:, 1]) < 16)
            b[bad] = [0, 0, hw, hw]
            return b

        def run_mode(boxes1, boxes2):
            b1 = jnp.asarray(clamp_boxes(boxes1), jnp.float32)
            b2 = jnp.asarray(clamp_boxes(boxes2), jnp.float32)
            c1, r1, _ = crop_resize_batch(img1, b1, (hw, hw))
            c2, r2, _ = crop_resize_batch(img2, b2, (hw, hw))
            crop1, ratio1 = np.asarray(c1), np.asarray(r1)
            crop2, ratio2 = np.asarray(c2), np.asarray(r2)
            box1, box2 = np.asarray(b1), np.asarray(b2)
            errors, precisions, n_match = [], [], []
            for i, it in enumerate(items):
                g0 = cv2.cvtColor((crop1[i] * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2GRAY)
                g1 = cv2.cvtColor((crop2[i] * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2GRAY)
                xy0, _, v0, d0 = sift_keypoints(g0, args.topk,
                                                with_descriptors=True)
                xy1, _, v1, d1 = sift_keypoints(g1, args.topk,
                                                with_descriptors=True)
                m = nearest_neighbor_match(jnp.asarray(d0)[None],
                                           jnp.asarray(d1)[None],
                                           jnp.asarray(v0)[None],
                                           jnp.asarray(v1)[None],
                                           ratio_threshold=0.9)
                matches0 = np.asarray(m["matches0"][0])
                sel = matches0 > -1
                matches = np.stack([np.nonzero(sel)[0], matches0[sel]])
                n_match.append(matches.shape[1])
                u0 = np.asarray(unwarp_keypoints(
                    jnp.asarray(xy0)[None], jnp.asarray(box1[i])[None],
                    jnp.asarray(ratio1[i])[None]))[0]
                u1 = np.asarray(unwarp_keypoints(
                    jnp.asarray(xy1)[None], jnp.asarray(box2[i])[None],
                    jnp.asarray(ratio2[i])[None]))[0]
                T_0to1 = it["pose2"] @ np.linalg.inv(it["pose1"])
                res = validation_error(u0, u1, matches, it["intrinsics1"],
                                       it["intrinsics2"], T_0to1)
                errors.append(max(res["error_t"], res["error_R"]))
                precisions.append(res["precision"])
            aucs = pose_auc(errors, [5, 10, 20])
            return {"auc@5": round(float(aucs[0]), 4),
                    "auc@10": round(float(aucs[1]), 4),
                    "auc@20": round(float(aucs[2]), 4),
                    "precision": round(float(np.mean(precisions)), 4),
                    "matches_per_pair": round(float(np.mean(n_match)), 1)}

        hb1 = np.asarray(boxes_from_prob_map(
            jnp.asarray(out["prob_map1"]), tokens, tokens, (hw, hw), best_q))
        hb2 = np.asarray(boxes_from_prob_map(
            jnp.asarray(out["prob_map2"]), tokens, tokens, (hw, hw), best_q))
        result["pose_ab"] = {
            "direct": run_mode(full, full),
            "heatmap_guided": run_mode(hb1, hb2),
            "tlbr_guided": run_mode(out["pred_bbox1"], out["pred_bbox2"]),
            "gt_guided": run_mode(gt1, gt2),
        }

    result["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
