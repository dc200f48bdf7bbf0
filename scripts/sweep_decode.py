#!/usr/bin/env python
"""Heatmap-decode (q, pad) selection for the trained flagship OETR.

VERDICT r4 weak #4: the round-4 "above-oracle" decode row came from
sweeping on the SAME val used for the claim. This script does it
properly: sweep the decode grid on a DEDICATED selection val (seed 1234
by default — never used for any shipped row), then re-run this script
once with ``--qs/--pads`` pinned to the winner on the held-out
seed-4242 n=200 val (the BASELINE.md §3 protocol) to report it.

Protocol per mode: decode boxes -> crop-equalize (ops/warp) -> SIFT ->
NN -> LO-RANSAC pose -> reference pose-AUC metric — identical to
scripts/overlap_ab_demo.py's eval half (reference semantics:
/root/reference/evaluation.py:57-224, eval_megadepth.py:48-52).

Prints ONE JSON line with direct/gt rows plus one row per (q, pad).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
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


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=".ckpt_oetr_r5/params")
    ap.add_argument("--val_seed", type=int, default=1234)
    ap.add_argument("--val_pairs", type=int, default=100)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--topk", type=int, default=1024)
    ap.add_argument("--qs", default="0.05,0.1,0.15")
    ap.add_argument("--pads", default="0.1,0.15,0.2,0.25")
    ap.add_argument("--data_dir", default="")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from oetr_tpu.config import BackboneConfig, NeckConfig, OETRConfig
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene
    from oetr_tpu.evalx.metrics import pose_auc
    from oetr_tpu.evalx.twoview import validation_error
    from oetr_tpu.geometry.boxes import bbox_overlaps_aligned
    from oetr_tpu.models import build_oetr
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints
    from oetr_tpu.ops.warp import crop_resize_batch, unwarp_keypoints

    t0 = time.time()
    hw = args.hw
    tokens = hw // 32
    qs = [float(x) for x in args.qs.split(",")]
    pads = [float(x) for x in args.pads.split(",")]

    cfg = OETRConfig(
        backbone=BackboneConfig(depth=args.depth, stop_layer="layer3",
                                last_layer=256 if args.depth == 18
                                else 1024),
        neck=NeckConfig(d_model=args.d_model, nhead=8,
                        num_layers=args.layers, num_decoder_layers=2,
                        max_shape=(tokens, tokens)))
    model = build_oetr(cfg)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, hw, hw, 3)),
                                 jnp.zeros((1, hw, hw, 3)))
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(args.ckpt), params)
    log(f"params restored from {args.ckpt} ({time.time() - t0:.0f}s)")

    tmp = args.data_dir or tempfile.mkdtemp(prefix="oetr_sweep_")
    val_txt = os.path.join(tmp, "val", "pairs.txt")
    if not os.path.exists(val_txt):
        val_txt = generate_scene(os.path.join(tmp, "val"),
                                 n_pairs=args.val_pairs, image_hw=hw,
                                 seed=args.val_seed,
                                 scale_range=(1.8, 3.2))
    val_ds = MegaDepthPairsDataset(os.path.join(tmp, "val"), val_txt,
                                   image_size=(hw, hw), train=False)
    items = [val_ds[i] for i in range(len(val_ds))]
    img1 = jnp.asarray(np.stack([it["image1"] for it in items]))
    img2 = jnp.asarray(np.stack([it["image2"] for it in items]))
    gt1 = np.stack([it["overlap_box1"] for it in items]).astype(np.float64)
    gt2 = np.stack([it["overlap_box2"] for it in items]).astype(np.float64)

    fwd = jax.jit(lambda a, b: model.apply(params, a, b,
                                           deterministic=True))
    outs = []
    for i in range(0, len(items), 8):
        outs.append(jax.tree.map(np.asarray, fwd(img1[i:i + 8],
                                                 img2[i:i + 8])))
    out = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    log(f"forward done ({time.time() - t0:.0f}s)")

    def clamp_boxes(b):
        b = np.asarray(b, np.float64).copy()
        b[:, 0::2] = np.clip(b[:, 0::2], 0, hw)
        b[:, 1::2] = np.clip(b[:, 1::2], 0, hw)
        bad = ((b[:, 2] - b[:, 0]) < 16) | ((b[:, 3] - b[:, 1]) < 16)
        b[bad] = [0, 0, hw, hw]
        return b

    def miou(a, b):
        return float(np.mean(np.asarray(bbox_overlaps_aligned(
            jnp.asarray(np.asarray(a, np.float32)),
            jnp.asarray(np.asarray(b, np.float32))))))

    def run_mode(boxes1, boxes2, with_sigma=False):
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
        row = {"auc@5": round(float(aucs[0]), 4),
               "auc@10": round(float(aucs[1]), 4),
               "auc@20": round(float(aucs[2]), 4),
               "precision": round(float(np.mean(precisions)), 4),
               "matches_per_pair": round(float(np.mean(n_match)), 1)}
        if with_sigma:
            bs = np.random.default_rng(7)
            errs = np.asarray(errors)
            row["auc@5_sigma"] = round(float(np.std(
                [pose_auc(errs[bs.integers(0, len(errs), len(errs))],
                          [5])[0] for _ in range(200)])), 4)
        return row

    full = np.tile([0, 0, hw, hw], (len(items), 1)).astype(np.float64)
    result = {"metric": "decode_sweep", "ckpt": args.ckpt,
              "val_seed": args.val_seed, "val_pairs": len(items),
              "direct": run_mode(full, full, with_sigma=True),
              "gt_guided": run_mode(gt1, gt2, with_sigma=True)}
    log(f"base rows done ({time.time() - t0:.0f}s)")

    from oetr_tpu.models.oetr import decode_boxes
    probs = {"prob_map1": jnp.asarray(out["prob_map1"]),
             "prob_map2": jnp.asarray(out["prob_map2"])}
    best_key, best_auc = None, -1.0
    for q in qs:
        for pad in pads:
            # The exact pipeline decode (PipelineConfig.box_q/box_pad
            # semantics) so the winner transfers verbatim.
            b1, b2 = decode_boxes(probs, (hw, hw), (hw, hw),
                                  source="heatmap", q=q, pad=pad)
            b1, b2 = np.asarray(b1), np.asarray(b2)
            row = run_mode(b1, b2, with_sigma=True)
            row["pred_miou"] = round((miou(clamp_boxes(b1), gt1)
                                      + miou(clamp_boxes(b2), gt2)) / 2, 4)
            key = f"q{q}_pad{pad}"
            result[key] = row
            log(f"{key}: auc@5 {row['auc@5']} miou {row['pred_miou']} "
                f"({time.time() - t0:.0f}s)")
            if row["auc@5"] > best_auc:
                best_auc, best_key = row["auc@5"], key

    d5 = result["direct"]["auc@5"]
    g5 = result["gt_guided"]["auc@5"]
    result["best"] = best_key
    result["best_lift_recovered"] = round(
        (best_auc - d5) / max(g5 - d5, 1e-9), 4)
    result["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
