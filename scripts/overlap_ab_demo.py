#!/usr/bin/env python
"""Headline-claim demo: overlap-guided matching beats direct matching
under scale difference (A/B through the real pipeline machinery).

This is the reference's reason to exist (README.md:9 — crop to the
co-visible region so the matcher works at equalized resolution),
reproduced end-to-end in this framework on generatable data:

  1. generate synthetic scale-difference pairs (camera 2 dollies in,
     scale 2-3x — the regime the reference trains on, scale_diff > 2,
     /root/reference/src/utils/megadepth_preprocess.py:199-220);
  2. train a small OETR from scratch on them (real train loop);
  3. on held-out pairs, match SIFT->NN->LO-RANSAC three ways:
       direct        — full images, the with_overlap=False path;
       oetr-guided   — crops from the *trained* model's predicted boxes
                       (predict -> crop-equalize -> extract -> match ->
                       un-warp, evaluation.py:57-224 semantics);
       gt-guided     — same, with ground-truth boxes (oracle bound);
     and score with the reference's pose-AUC protocol
     (dloc/evaluate/eval_megadepth.py:35-77).

Prints one JSON line with the three rows. Designed for the TPU chip
(shares the persistent compile cache); works on CPU with --steps 60.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--train_pairs", type=int, default=256)
    ap.add_argument("--val_pairs", type=int, default=40)
    ap.add_argument("--val_seed", type=int, default=999,
                    help="val-set RNG seed (a different seed gives a "
                         "FRESH held-out set — guards decode "
                         "hyperparameters against val overfitting)")
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--d_model", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--dec_layers", type=int, default=2)
    ap.add_argument("--depth", type=int, default=18,
                    help="resnet depth (18/50)")
    ap.add_argument("--milestones", type=str, default="",
                    help="comma-separated step milestones for 0.1x lr decay"
                         " (default: none)")
    ap.add_argument("--train_scale_min", type=float, default=1.8,
                    help="lower edge of the TRAIN pair scale range: 1.0 "
                         "mixes easy same-scale/translation pairs into "
                         "training (a from-scratch backbone has no "
                         "pretrained scale-robust features — the mixture "
                         "bootstraps matching before the hard 2-3x "
                         "pairs); val pairs stay at (1.8, 3.2)")
    ap.add_argument("--train_translate_frac", type=float, default=0.0,
                    help="fraction of TRAIN pairs that are pure "
                         "same-scale translations (easy matching)")
    ap.add_argument("--topk", type=int, default=1024)
    ap.add_argument("--ckpt_dir", type=str, default="",
                    help="orbax checkpoint dir: resume from the latest "
                         "step if present, save the final state")
    ap.add_argument("--save_every", type=int, default=1000,
                    help="with --ckpt_dir: also save every N steps (the "
                         "tunneled TPU backend leaks ~25 MB/step of host "
                         "memory — long runs must checkpoint so a "
                         "restart loop can bound the leak)")
    ap.add_argument("--data_dir", type=str, default="",
                    help="persistent dataset dir: generate once, reuse "
                         "on restart (512-pair generation costs ~10 min "
                         "of CPU)")
    ap.add_argument("--aux_match", type=float, default=0.0,
                    help="weight of the auxiliary coarse-correspondence "
                         "InfoNCE (token matching supervised from the "
                         "known geometry) — the direct cross-scale "
                         "matching signal a from-scratch backbone needs")
    ap.add_argument("--heatmap", type=float, default=0.0,
                    help="weight of dense heatmap supervision (CE vs "
                         "uniform-in-GT-box tokens)")
    ap.add_argument("--size_loss", type=float, default=0.0,
                    help="weight of direct FCOS-style tlbr size-head "
                         "supervision (anti-hedging, losses.size_loss)")
    ap.add_argument("--reweight", type=float, default=0.0,
                    help="difficulty reweighting power: per-pair loss "
                         "weights ~ scale_diff**p (losses."
                         "difficulty_weights)")
    ap.add_argument("--device_data", action="store_true",
                    help="generate training batches ON-DEVICE (data."
                         "device_synth) — an infinite fresh-pair stream "
                         "instead of a finite memorizable disk dataset; "
                         "val pairs still come from --data_dir/disk")
    ap.add_argument("--illum_jitter", type=float, default=0.0,
                    help="with --device_data: +-fraction illumination "
                         "gain jitter on image2")
    ap.add_argument("--box_source", type=str, default="tlbr",
                    choices=("tlbr", "heatmap"),
                    help="eval-time box decode (models.oetr.decode_boxes)"
                         ": the reference's center+size head, or "
                         "heatmap mass quantiles + padding (round-4: "
                         "wins the A/B where the size head hedges)")
    ap.add_argument("--box_q", type=float, default=0.1)
    ap.add_argument("--box_pad", type=float, default=0.2)
    ap.add_argument("--skip_eval", action="store_true",
                    help="train/checkpoint only (for intermediate "
                         "segments of a restart loop); prints a short "
                         "JSON instead of the A/B table")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene
    from oetr_tpu.evalx.metrics import pose_auc
    from oetr_tpu.evalx.twoview import validation_error
    from oetr_tpu.geometry.boxes import bbox_overlaps_aligned
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints
    from oetr_tpu.ops.warp import crop_resize_batch, unwarp_keypoints
    from oetr_tpu.training import create_train_state, make_train_step

    t0 = time.time()
    hw = args.hw
    tmp = args.data_dir or tempfile.mkdtemp(prefix="oetr_ab_")
    train_txt = os.path.join(tmp, "train", "pairs.txt")
    val_txt = os.path.join(tmp, "val", "pairs.txt")
    if not (args.data_dir and os.path.exists(val_txt)
            and (args.device_data or os.path.exists(train_txt))):
        if not args.device_data:
            train_txt = generate_scene(
                os.path.join(tmp, "train"), n_pairs=args.train_pairs,
                image_hw=hw, seed=0,
                scale_range=(args.train_scale_min, 3.2),
                p_translate=args.train_translate_frac)
        val_txt = generate_scene(os.path.join(tmp, "val"),
                                 n_pairs=args.val_pairs, image_hw=hw,
                                 seed=args.val_seed, scale_range=(1.8, 3.2))
    else:
        print(f"# reusing dataset at {tmp}", file=sys.stderr, flush=True)
    train_ds = None
    if not args.device_data:
        train_ds = MegaDepthPairsDataset(os.path.join(tmp, "train"),
                                         train_txt, image_size=(hw, hw),
                                         train=True)
    val_ds = MegaDepthPairsDataset(os.path.join(tmp, "val"), val_txt,
                                   image_size=(hw, hw), train=False)

    # --- train a small OETR on the scale-difference pairs ----------------
    tokens = hw // 32            # layer3 stride 16 + patch-merge halving
    model_cfg = OETRConfig(
        backbone=BackboneConfig(depth=args.depth, stop_layer="layer3",
                                last_layer=256 if args.depth == 18 else 1024),
        neck=NeckConfig(d_model=args.d_model, nhead=8, num_layers=args.layers,
                        num_decoder_layers=args.dec_layers,
                        max_shape=(tokens, tokens)))
    milestones = (tuple(int(m) for m in args.milestones.split(","))
                  if args.milestones else (10 ** 6,))
    train_cfg = TrainConfig(batch_size=args.batch, image_size=(hw, hw),
                            lr=args.lr, lr_milestones=milestones)
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.key(0), (hw, hw))
    step_fn = make_train_step(model, tx, cycle=True,
                              aux_match_weight=args.aux_match,
                              heatmap_weight=args.heatmap,
                              size_weight=args.size_loss,
                              reweight_power=args.reweight)
    ckpt_dir = os.path.abspath(args.ckpt_dir) if args.ckpt_dir else None
    start_step = 0
    if ckpt_dir:
        from oetr_tpu.training.train import (latest_checkpoint_step,
                                             load_checkpoint)
        last = latest_checkpoint_step(ckpt_dir)
        if last is not None:
            state = load_checkpoint(ckpt_dir, last, state)
            start_step = last
            print(f"# resumed from step {last}", file=sys.stderr, flush=True)
    rng = jax.random.key(1)
    if start_step:
        rng = jax.random.fold_in(rng, start_step)
    it, last_loss = start_step, float("nan")

    def batch_stream():
        """Yield training batches forever (disk epochs or device synth)."""
        if args.device_data:
            # Infinite fresh pairs, generated on the accelerator — the
            # round-4 fix for dataset memorization (device_synth docstring).
            from oetr_tpu.data.device_synth import make_device_generator
            gen = make_device_generator(
                hw, args.batch,
                scale_range=(max(args.train_scale_min, 1.0), 3.2),
                p_translate=args.train_translate_frac,
                illum_jitter=args.illum_jitter)
            data_rng = jax.random.fold_in(jax.random.key(7), start_step)
            while True:
                data_rng, k = jax.random.split(data_rng)
                yield gen(k)
        else:
            while True:
                train_ds.build_dataset()
                yield from train_ds.batches(args.batch,
                                            geometry=args.aux_match > 0)

    for batch in batch_stream():
        if it >= args.steps:
            break
        rng, drop = jax.random.split(rng)
        state, metrics = step_fn(state, batch, drop)
        last_loss = float(metrics["loss"])
        if it % 50 == 0:
            miou = float((metrics["iou1"] + metrics["iou2"]) / 2)
            aux = (f" aux {float(metrics['aux_match_loss']):.3f}"
                   if "aux_match_loss" in metrics else "")
            print(f"# step {it} loss {last_loss:.4f} "
                  f"train_miou {miou:.3f}{aux} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
        it += 1
        if (ckpt_dir and args.save_every
                and it % args.save_every == 0 and it < args.steps):
            from oetr_tpu.training.train import save_checkpoint
            save_checkpoint(ckpt_dir, state, it)
            print(f"# checkpoint step {it}", file=sys.stderr,
                  flush=True)

    if ckpt_dir and it > start_step:
        # it == start_step means training was skipped (resumed at the
        # target step): step_{it} already exists and orbax refuses to
        # overwrite it — skip so resume-to-re-eval works.
        from oetr_tpu.training.train import save_checkpoint
        save_checkpoint(ckpt_dir, state, it)
        print(f"# saved checkpoint step {it}", file=sys.stderr, flush=True)

    if args.skip_eval:
        print(json.dumps({"metric": "overlap_ab_train_segment",
                          "steps": it,
                          "train_loss_last": (round(last_loss, 4)
                                              if np.isfinite(last_loss)
                                              else None),
                          "wall_s": round(time.time() - t0, 1)}))
        return

    # --- held-out evaluation: three matching modes -----------------------
    items = [val_ds[i] for i in range(len(val_ds))]
    img1 = jnp.asarray(np.stack([it_["image1"] for it_ in items]))
    img2 = jnp.asarray(np.stack([it_["image2"] for it_ in items]))
    # Chunked apply: round-5 n>=200 val sets no longer fit the model's
    # activation memory in one batch; one fixed-shape executable over
    # padded chunks keeps compiles bounded.
    from oetr_tpu.models.oetr import decode_boxes
    CH = 40
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b, deterministic=True))
    d1s, d2s = [], []
    for s in range(0, len(items), CH):
        a = img1[s:s + CH]
        b = img2[s:s + CH]
        pad = CH - a.shape[0]
        if pad:
            a = jnp.concatenate([a, jnp.tile(a[-1:], (pad, 1, 1, 1))])
            b = jnp.concatenate([b, jnp.tile(b[-1:], (pad, 1, 1, 1))])
        out = fwd(state.params, a, b)
        c1, c2 = decode_boxes(out, (hw, hw), (hw, hw),
                              source=args.box_source, q=args.box_q,
                              pad=args.box_pad)
        d1s.append(np.asarray(c1)[:CH - pad if pad else CH])
        d2s.append(np.asarray(c2)[:CH - pad if pad else CH])
    pred1 = np.concatenate(d1s).astype(np.float64)
    pred2 = np.concatenate(d2s).astype(np.float64)
    gt1 = np.stack([it_["overlap_box1"] for it_ in items]).astype(np.float64)
    gt2 = np.stack([it_["overlap_box2"] for it_ in items]).astype(np.float64)
    iou1 = np.asarray(bbox_overlaps_aligned(jnp.asarray(pred1), jnp.asarray(gt1)))
    iou2 = np.asarray(bbox_overlaps_aligned(jnp.asarray(pred2), jnp.asarray(gt2)))

    def clamp_boxes(b):
        b = np.asarray(b, np.float64).copy()
        b[:, 0::2] = np.clip(b[:, 0::2], 0, hw)
        b[:, 1::2] = np.clip(b[:, 1::2], 0, hw)
        # degenerate -> full image (gate rule 1, evaluation.py:100-103)
        bad = ((b[:, 2] - b[:, 0]) < 16) | ((b[:, 3] - b[:, 1]) < 16)
        b[bad] = [0, 0, hw, hw]
        return b

    def crops_for(boxes1, boxes2):
        b1 = jnp.asarray(clamp_boxes(boxes1), jnp.float32)
        b2 = jnp.asarray(clamp_boxes(boxes2), jnp.float32)
        c1, r1, _ = crop_resize_batch(img1, b1, (hw, hw))
        c2, r2, _ = crop_resize_batch(img2, b2, (hw, hw))
        return (np.asarray(c1), np.asarray(r1), np.asarray(b1),
                np.asarray(c2), np.asarray(r2), np.asarray(b2))

    def run_mode(crop1, ratio1, box1, crop2, ratio2, box2):
        errors, precisions, mscores, n_match = [], [], [], []
        for i, it_ in enumerate(items):
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
            # canvas -> original frame (overlap_features.py:123-127)
            u0 = np.asarray(unwarp_keypoints(
                jnp.asarray(xy0)[None], jnp.asarray(box1[i])[None],
                jnp.asarray(ratio1[i])[None]))[0]
            u1 = np.asarray(unwarp_keypoints(
                jnp.asarray(xy1)[None], jnp.asarray(box2[i])[None],
                jnp.asarray(ratio2[i])[None]))[0]
            T_0to1 = it_["pose2"] @ np.linalg.inv(it_["pose1"])
            res = validation_error(u0, u1, matches, it_["intrinsics1"],
                                   it_["intrinsics2"], T_0to1)
            errors.append(max(res["error_t"], res["error_R"]))
            precisions.append(res["precision"])
            mscores.append(res["matching_score"])
        aucs = pose_auc(errors, [5, 10, 20])
        # Bootstrap sigma over pairs (VERDICT r4 weak #7: report spread
        # so A/B deltas can be judged against sampling noise).
        bs = np.random.default_rng(7)
        errs = np.asarray(errors)
        sig = float(np.std([pose_auc(errs[bs.integers(0, len(errs),
                                                      len(errs))], [5])[0]
                            for _ in range(200)]))
        return {
            "auc@5": round(float(aucs[0]), 4),
            "auc@5_sigma": round(sig, 4),
            "auc@10": round(float(aucs[1]), 4),
            "auc@20": round(float(aucs[2]), 4),
            "precision": round(float(np.mean(precisions)), 4),
            "matches_per_pair": round(float(np.mean(n_match)), 1),
        }

    full1 = np.tile([0, 0, hw, hw], (len(items), 1)).astype(np.float64)
    modes = {
        "direct": crops_for(full1, full1),
        "oetr_guided": crops_for(pred1, pred2),
        "gt_guided": crops_for(gt1, gt2),
    }
    rows = {name: run_mode(*data) for name, data in modes.items()}

    print(json.dumps({
        "metric": "overlap_ab_pose_auc",
        "steps": args.steps, "hw": hw, "val_pairs": args.val_pairs,
        "d_model": args.d_model, "layers": args.layers,
        "train_loss_last": (round(last_loss, 4)
                            if np.isfinite(last_loss) else None),
        "pred_box_miou": round(float((iou1.mean() + iou2.mean()) / 2), 4),
        **{name: row for name, row in rows.items()},
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
