#!/usr/bin/env python
"""Learned SuperPoint+SuperGlue, end to end: train from scratch, then
beat SIFT+NN on the synthetic pose benchmark.

The reference's benchmark protagonist is SuperPoint+SuperGlue
(/root/reference/dloc/core/match_features.py:24-56) with *downloaded*
checkpoints (the third_party submodule is empty in-repo). This script
produces the first from-scratch end-to-end accuracy number for the flax
networks as MATCHERS:

  1. SuperPoint: joint MagicPoint detector CE (synthetic shapes, exact
     corners) + descriptor hinge on texture homography pairs
     (training/superpoint.py, paper recipe);
  2. SuperGlue: OT-NLL on GT assignments derived from known scene
     geometry (depth+pose warp) over the trained SuperPoint's keypoints;
  3. eval on held-out scenes: SIFT+NN vs SP+NN vs SP+SG with the
     reference's pose-AUC protocol (same machinery as eval_demo).

Checkpoints are saved/resumed via orbax (--ckpt_dir), so phases can be
re-run incrementally. Prints one JSON line.
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


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def warp_points_via_depth(xy, depth1, K1, T_0to1, K2):
    """[K, 2] image1 points -> image2 via depth+pose. Returns (xy2, ok)."""
    import jax.numpy as jnp

    from oetr_tpu.training.losses import interpolate_depth

    z, ok = interpolate_depth(jnp.asarray(depth1), jnp.asarray(xy))
    x = (xy[:, 0] - K1[0, 2]) * z / K1[0, 0]
    y = (xy[:, 1] - K1[1, 2]) * z / K1[1, 1]
    P = jnp.stack([x, y, z], axis=-1)
    Pc2 = P @ jnp.asarray(T_0to1[:3, :3]).T + jnp.asarray(T_0to1[:3, 3])
    uv = Pc2 @ jnp.asarray(K2).T
    xy2 = uv[:, :2] / jnp.where(jnp.abs(uv[:, 2:]) > 1e-9, uv[:, 2:], 1e-9)
    ok = ok & (Pc2[:, 2] > 1e-6)
    return xy2, ok


def gt_matches_from_geometry(xy0, v0, xy1, v1, depth1, K1, T_0to1, K2,
                             radius=3.0):
    """Mutual-NN GT assignment under the known warp. Returns [K] int."""
    import numpy as np

    xy2, ok = warp_points_via_depth(xy0, depth1, K1, T_0to1, K2)
    xy2, ok = np.asarray(xy2), np.asarray(ok) & np.asarray(v0)
    d = np.linalg.norm(xy2[:, None] - np.asarray(xy1)[None], axis=-1)
    d[~ok] = 1e9
    d[:, ~np.asarray(v1)] = 1e9
    nn1 = d.argmin(1)
    best = d[np.arange(len(xy0)), nn1]
    # mutual check
    nn0 = d.argmin(0)
    mutual = nn0[nn1] == np.arange(len(xy0))
    gt = np.where((best < radius) & mutual, nn1, -1)
    return gt.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp_steps", type=int, default=2000)
    ap.add_argument("--sg_steps", type=int, default=1500)
    ap.add_argument("--sp_batch", type=int, default=32)
    ap.add_argument("--sg_batch", type=int, default=8)
    ap.add_argument("--sp_hw", type=int, default=128)
    ap.add_argument("--hw", type=int, default=256,
                    help="scene pair size for SG training + eval")
    ap.add_argument("--topk", type=int, default=512)
    ap.add_argument("--train_pairs", type=int, default=192)
    ap.add_argument("--val_pairs", type=int, default=40)
    ap.add_argument("--tex_pool", type=int, default=160)
    ap.add_argument("--ckpt_dir", type=str, default="")
    ap.add_argument("--desc_dim", type=int, default=128)
    ap.add_argument("--device_data", action="store_true",
                    help="stream BOTH training phases from on-device "
                         "generators (data/device_synth): fresh texture "
                         "homography pairs for the SP descriptor hinge "
                         "and fresh scene pairs + jnp GT assignments for "
                         "SG — removes the host data bottleneck and the "
                         "fixed memorizable pools (round-4 diagnosis: "
                         "the 1200-step SG didn't even fit its 192 "
                         "pre-extracted pairs)")
    ap.add_argument("--sg_lr", type=float, default=1e-4)
    ap.add_argument("--teacher", choices=("corner", "ha", "none"),
                    default="corner",
                    help="texture-domain detector supervision for the "
                         "--device_data SP phase. 'ha' = homographic "
                         "adaptation from the CURRENT detector "
                         "(SuperPoint paper §5) — round-5 measured "
                         "result: a clean 12k HA run left "
                         "repeatability@3px UNCHANGED (0.266) and its "
                         "keypoint stream starved the SG phase into "
                         "dustbin collapse (10 matches/pair, assign "
                         "recall 0.013): the shapes-only detector has "
                         "no texture response for the averaging to "
                         "stabilize, so the forced label budget "
                         "distills noise. 'corner' (default) = static "
                         "Shi-Tomasi corner teacher "
                         "(training/superpoint.make_corner_labeler), "
                         "whose own repeatability on these scenes is "
                         "0.74 — above SIFT's 0.68 — active from step "
                         "0. 'none' = shapes+descriptor only (the "
                         "round-4 shipped recipe).")
    ap.add_argument("--max_steps_per_segment", type=int, default=0,
                    help="checkpoint full phase state and re-exec the "
                         "process after this many optimizer steps "
                         "(SP+SG combined) — the tunneled TPU backend "
                         "leaks host memory per step (BASELINE.md), so "
                         "long runs must be segmented. 0 = off. "
                         "Requires --ckpt_dir and --device_data.")
    args = ap.parse_args()
    if args.max_steps_per_segment and not args.ckpt_dir:
        ap.error("--max_steps_per_segment requires --ckpt_dir")

    import cv2
    import jax.numpy as jnp
    import numpy as np
    import optax

    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import _texture, generate_scene
    from oetr_tpu.evalx.metrics import pose_auc
    from oetr_tpu.evalx.twoview import validation_error
    from oetr_tpu.models.matchers import nearest_neighbor_match
    from oetr_tpu.models.sift_based import sift_keypoints
    from oetr_tpu.models.superglue import SuperGlue
    from oetr_tpu.models.superpoint import SuperPoint, SuperPointNet
    from oetr_tpu.training.superglue import (make_superglue_train_step,
                                             superglue_nll_loss)
    from oetr_tpu.training.superpoint import (
        corners_to_cell_labels, homography_pairs_batch,
        make_superpoint_joint_train_step, random_homography,
        synthetic_shapes_batch)

    t0 = time.time()
    rng = np.random.default_rng(0)
    hw, sp_hw, k = args.hw, args.sp_hw, args.topk

    ckpt = None
    if args.ckpt_dir:
        import orbax.checkpoint as ocp
        os.makedirs(args.ckpt_dir, exist_ok=True)
        ckpt = ocp.StandardCheckpointer()

    def maybe_restore(name, target):
        path = os.path.abspath(os.path.join(args.ckpt_dir, name))
        if ckpt is not None and os.path.exists(path):
            log(f"restoring {name}")
            return ckpt.restore(path, target), True
        return target, False

    def maybe_save(name, tree):
        if ckpt is not None:
            path = os.path.abspath(os.path.join(args.ckpt_dir, name))
            if not os.path.exists(path):
                ckpt.save(path, jax.tree.map(jnp.asarray, tree))
                ckpt.wait_until_finished()

    # --- segmented resume (host-leak workaround, cf. training/cli.py) ---
    # The tunneled TPU backend leaks ~25 MB of host memory per dispatched
    # step (BASELINE.md); long runs checkpoint the full phase state every
    # segment and re-exec the process with identical argv.
    seg_steps = 0
    seg_tick = (max(1, min(100, args.max_steps_per_segment))
                if args.max_steps_per_segment else 100)

    def save_state(name, tree):
        """Overwrite-save that survives os.execv.

        orbax's in-place force=True overwrite finalizes on a background
        thread (observed races before the re-exec: an orphaned
        *.orbax-checkpoint-tmp, then a FileExistsError from its own
        rename). Save into a FRESH sibling directory instead, wait for
        the finalize rename to land, then swap atomically ourselves.
        """
        if ckpt is None:
            return
        import shutil
        path = os.path.abspath(os.path.join(args.ckpt_dir, name))
        new = path + ".new"
        for p in (new, new + ".orbax-checkpoint-tmp"):
            if os.path.exists(p):
                shutil.rmtree(p)
        ckpt.save(new, jax.tree.map(jnp.asarray, tree))
        ckpt.wait_until_finished()
        for _ in range(150):
            if os.path.exists(new) and not os.path.exists(
                    new + ".orbax-checkpoint-tmp"):
                break
            time.sleep(0.2)
        else:
            raise RuntimeError(f"checkpoint finalize did not land: {new}")
        old = path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(new, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def restore_state(name, target):
        path = os.path.abspath(os.path.join(args.ckpt_dir, name))
        if ckpt is None:
            return target
        # A kill between save_state's two renames leaves only
        # path+'.old'; recover from it rather than restarting at step 0.
        if not os.path.exists(path) and os.path.exists(path + ".old"):
            log(f"recovering segment state {name} from .old")
            os.rename(path + ".old", path)
        if os.path.exists(path):
            log(f"restoring segment state {name}")
            return ckpt.restore(path, target)
        return target

    def segment_tick(n, save_fn):
        """Count optimizer steps in this process; checkpoint and re-exec
        once the segment budget is spent."""
        nonlocal seg_steps
        seg_steps += n
        if (args.max_steps_per_segment
                and seg_steps >= args.max_steps_per_segment):
            save_fn()
            log(f"segment limit {args.max_steps_per_segment} reached; "
                "re-exec")
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)

    # ---- Phase 1: SuperPoint ------------------------------------------
    net = SuperPointNet(descriptor_dim=args.desc_dim)
    sp_params = jax.jit(net.init)(jax.random.key(0),
                                  jnp.zeros((1, sp_hw, sp_hw, 1)))
    sp_params, restored = maybe_restore("superpoint", sp_params)
    if not restored and args.sp_steps > 0:
        if args.device_data:
            from oetr_tpu.data.device_synth import \
                make_homography_pair_generator
            hp_gen = make_homography_pair_generator(
                sp_hw, args.sp_batch, scale_range=(0.55, 1.8))
            hp_base = jax.random.key(11)

            def pair_batch(b, it=0):
                # fold_in keeps the stream deterministic across
                # segment re-execs (a split chain would restart).
                return hp_gen(jax.random.fold_in(hp_base, it))
        else:
            log(f"texture pool ({args.tex_pool})...")
            pool = [cv2.cvtColor(_texture(rng, sp_hw, sp_hw),
                                 cv2.COLOR_RGB2GRAY).astype(np.float32)
                    / 255.0 for _ in range(args.tex_pool)]

            def pair_batch(b, it=0):
                im0 = np.zeros((b, sp_hw, sp_hw, 1), np.float32)
                im1 = np.zeros((b, sp_hw, sp_hw, 1), np.float32)
                Hs = np.zeros((b, 3, 3), np.float64)
                for i in range(b):
                    g = pool[int(rng.integers(len(pool)))]
                    # Scale range spans the eval regime (scene pairs
                    # dolly up to 2x) so descriptors see the full gap.
                    H = random_homography(rng, (sp_hw, sp_hw),
                                          scale_range=(0.55, 1.8))
                    im0[i, :, :, 0] = g
                    im1[i, :, :, 0] = cv2.warpPerspective(
                        g, H, (sp_hw, sp_hw), flags=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
                    Hs[i] = H
                return im0, im1, Hs

        # Clip: the joint loss NaN'd within 100 TPU steps at plain
        # adam(1e-3) (loss-spike -> inf grads; CPU runs survived only by
        # luck of precision).
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(optax.piecewise_constant_schedule(
                5e-4, {int(args.sp_steps * 0.7): 0.1})))
        opt = tx.init(sp_params)
        state = restore_state("superpoint_state", {
            "params": sp_params, "opt": opt,
            "step": jnp.zeros((), jnp.int32)})
        sp_params, opt = state["params"], state["opt"]
        sp_start = int(state["step"])
        if sp_start:
            rng = np.random.default_rng(1000 + sp_start)
        if args.device_data and args.teacher != "none":
            # Texture-domain detector supervision (see --teacher help):
            # a second detector CE on the texture stream, labels either
            # from homographic adaptation of the current detector ('ha',
            # active from 40% of the budget) or from the static
            # Shi-Tomasi corner teacher ('corner', active from step 0 —
            # a static teacher needs no bootstrap phase).
            from oetr_tpu.training.superpoint import (
                make_corner_labeler, make_ha_labeler,
                make_superpoint_joint_ha_train_step)
            if args.teacher == "ha":
                ha_label = make_ha_labeler(net, sp_hw)
                ha_start = int(args.sp_steps * 0.4)
            else:
                corner_label = make_corner_labeler(sp_hw)
                ha_start = 0
            step_ha = make_superpoint_joint_ha_train_step(
                net, tx, lambda_desc=1.0, lambda_ha=1.0)
        else:
            step = make_superpoint_joint_train_step(net, tx,
                                                    lambda_desc=1.0)
        hc = sp_hw // 8
        for it in range(sp_start, args.sp_steps):
            imgs, corners, counts = synthetic_shapes_batch(
                rng, args.sp_batch, sp_hw)
            labels = jnp.asarray(corners_to_cell_labels(
                corners, (sp_hw, sp_hw), counts))
            im0, im1, H = pair_batch(args.sp_batch, it)
            if args.device_data and args.teacher != "none":
                if it >= ha_start:
                    hl = (ha_label(sp_params, im0,
                                   jax.random.fold_in(hp_base,
                                                      10 ** 6 + it))
                          if args.teacher == "ha"
                          else corner_label(jnp.asarray(im0)))
                    ha_w = jnp.float32(1.0)
                else:
                    hl = jnp.full((args.sp_batch, hc, hc), 64, jnp.int32)
                    ha_w = jnp.float32(0.0)
                sp_params, opt, m = step_ha(
                    sp_params, opt, jnp.asarray(imgs), labels,
                    jnp.asarray(im0), jnp.asarray(im1), jnp.asarray(H),
                    hl, ha_w)
            else:
                sp_params, opt, m = step(sp_params, opt, jnp.asarray(imgs),
                                         labels, jnp.asarray(im0),
                                         jnp.asarray(im1), jnp.asarray(H))
            if it % 100 == 0:
                det = float(m["det_loss"])
                des = float(m["desc_loss"])
                ha = float(m.get("ha_loss", 0.0))
                log(f"SP step {it} det {det:.3f} desc {des:.3f} "
                    f"ha {ha:.3f} ({time.time() - t0:.0f}s)")
                if not (np.isfinite(det) and np.isfinite(des)):
                    raise RuntimeError(f"SP training diverged at {it}")
            if (it + 1) % seg_tick == 0 and (it + 1) < args.sp_steps:
                segment_tick(seg_tick, lambda: save_state(
                    "superpoint_state",
                    {"params": sp_params, "opt": opt,
                     "step": jnp.asarray(it + 1, jnp.int32)}))
        maybe_save("superpoint", sp_params)

    # Fixed-k extractor sharing the trained net params.
    # keypoint_threshold 0: take the top-k cells by score outright. The
    # round-4 12k-step detector is sharply confident on shape-like
    # corners and near-zero elsewhere, so a 0.001 gate left only ~160
    # valid keypoints on texture scenes and starved the GT assignment
    # of the SG phase (5 GT matches/pair vs 98 ungated — measured).
    sp = SuperPoint(max_keypoints=k, keypoint_threshold=0.0,
                    descriptor_dim=args.desc_dim)
    sp_full = {"params": {"net": sp_params["params"]}}

    @jax.jit
    def extract(gray):           # [B, hw, hw, 1] -> dict
        return sp.apply(sp_full, gray)

    # ---- Phase 2: SuperGlue on trained-SP keypoints -------------------
    log("generating scene pairs for SG training/eval...")
    tmp = tempfile.mkdtemp(prefix="oetr_matchdemo_")
    train_txt = generate_scene(os.path.join(tmp, "train"),
                               n_pairs=args.train_pairs, image_hw=hw,
                               seed=1, scale_range=(1.0, 2.0),
                               p_translate=0.5)
    val_txt = generate_scene(os.path.join(tmp, "val"),
                             n_pairs=args.val_pairs, image_hw=hw, seed=99,
                             scale_range=(1.0, 2.0), p_translate=0.5)
    train_ds = MegaDepthPairsDataset(os.path.join(tmp, "train"), train_txt,
                                     image_size=(hw, hw), train=False)
    val_ds = MegaDepthPairsDataset(os.path.join(tmp, "val"), val_txt,
                                   image_size=(hw, hw), train=False)

    def gray_of(item, key):
        return np.dot(item[key][..., :3],
                      [0.299, 0.587, 0.114]).astype(np.float32)[..., None]

    def sp_data(items):
        """Extract SP features for a list of pairs; build SG batch."""
        g0 = jnp.asarray(np.stack([gray_of(it, "image1") for it in items]))
        g1 = jnp.asarray(np.stack([gray_of(it, "image2") for it in items]))
        e0 = extract(g0)
        e1 = extract(g1)
        return e0, e1

    sg = SuperGlue(descriptor_dim=args.desc_dim)
    dummy = {
        "keypoints0": jnp.zeros((1, k, 2)), "keypoints1": jnp.zeros((1, k, 2)),
        "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
        "descriptors0": jnp.zeros((1, k, args.desc_dim)),
        "descriptors1": jnp.zeros((1, k, args.desc_dim)),
        "valid0": jnp.ones((1, k), bool), "valid1": jnp.ones((1, k), bool),
        "image_hw0": (hw, hw), "image_hw1": (hw, hw),
    }
    # image_hw are shape statics: close over them so jit doesn't trace.
    _d = {key: v for key, v in dummy.items()
          if not key.startswith("image_hw")}
    sg_params = jax.jit(lambda kk, dd: sg.init(
        kk, dict(dd, image_hw0=(hw, hw), image_hw1=(hw, hw))))(
            jax.random.key(1), _d)
    sg_params, sg_restored = maybe_restore("superglue", sg_params)

    if not sg_restored and args.sg_steps > 0 and args.device_data:
        # Streaming pipeline, fully on device: fresh scene pairs ->
        # grayscale -> frozen-SP extraction -> jnp GT assignment -> OT
        # step. No fixed dataset exists to memorize, and the host never
        # touches pixels (round-4 SG fix).
        from oetr_tpu.data.device_synth import make_device_generator
        from oetr_tpu.training.superglue import gt_matches_batch
        scene_gen = make_device_generator(
            hw, args.sg_batch, scale_range=(1.0, 2.0), p_translate=0.5)
        lum = jnp.asarray([0.299, 0.587, 0.114])

        @jax.jit
        def sg_prep(raw):
            g0 = (raw["image1"] @ lum)[..., None]
            g1 = (raw["image2"] @ lum)[..., None]
            e0 = sp.apply(sp_full, g0)
            e1 = sp.apply(sp_full, g1)
            T = jax.vmap(lambda p2, p1: p2 @ jnp.linalg.inv(p1))(
                raw["pose2"], raw["pose1"])
            gt = gt_matches_batch(e0["keypoints"], e0["valid"],
                                  e1["keypoints"], e1["valid"],
                                  raw["depth1"], raw["K1"], T, raw["K2"],
                                  depth1=raw["depth2"])
            return {"keypoints0": e0["keypoints"],
                    "keypoints1": e1["keypoints"],
                    "scores0": e0["scores"], "scores1": e1["scores"],
                    "descriptors0": e0["descriptors"],
                    "descriptors1": e1["descriptors"],
                    "valid0": e0["valid"], "valid1": e1["valid"],
                    "gt_matches0": gt}

        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(optax.piecewise_constant_schedule(
                args.sg_lr, {int(args.sg_steps * 0.7): 0.1})))
        opt = tx.init(sg_params)
        state = restore_state("superglue_state", {
            "params": sg_params, "opt": opt,
            "step": jnp.zeros((), jnp.int32)})
        sg_params, opt = state["params"], state["opt"]
        sg_start = int(state["step"])
        sg_step = make_superglue_train_step(sg, tx)
        sg_base = jax.random.key(23)
        for it in range(sg_start, args.sg_steps):
            k_ = jax.random.fold_in(sg_base, it)
            batch = dict(sg_prep(scene_gen(k_)),
                         image_hw0=(hw, hw), image_hw1=(hw, hw))
            sg_params, opt, m = sg_step(sg_params, opt, batch)
            if it % 200 == 0:
                # Supervision density: the round-5 HA run collapsed to
                # dustbin with high match_acc because GT was starved —
                # make that failure visible live.
                n_gt = float(jnp.mean(jnp.sum(
                    batch["gt_matches0"] >= 0, axis=-1)))
                log(f"SG step {it} nll {float(m['loss']):.4f} acc "
                    f"{float(m['match_acc']):.3f} gt/pair {n_gt:.0f} "
                    f"({time.time() - t0:.0f}s)")
            if (it + 1) % seg_tick == 0 and (it + 1) < args.sg_steps:
                segment_tick(seg_tick, lambda: save_state(
                    "superglue_state",
                    {"params": sg_params, "opt": opt,
                     "step": jnp.asarray(it + 1, jnp.int32)}))
        maybe_save("superglue", sg_params)
    elif not sg_restored and args.sg_steps > 0:
        # Pre-extract features + GT for every training pair (static data).
        feats = []
        for start in range(0, len(train_ds), 16):
            items = [train_ds[i] for i in range(
                start, min(start + 16, len(train_ds)))]
            pad = 16 - len(items)      # keep one batch-16 executable
            e0, e1 = sp_data(items + [items[-1]] * pad)
            for j, it_ in enumerate(items):
                T = it_["pose2"] @ np.linalg.inv(it_["pose1"])
                gt = gt_matches_from_geometry(
                    np.asarray(e0["keypoints"][j]),
                    np.asarray(e0["valid"][j]),
                    np.asarray(e1["keypoints"][j]),
                    np.asarray(e1["valid"][j]),
                    it_["depth1"], it_["intrinsics1"], T,
                    it_["intrinsics2"])
                feats.append({
                    "keypoints0": np.asarray(e0["keypoints"][j]),
                    "keypoints1": np.asarray(e1["keypoints"][j]),
                    "scores0": np.asarray(e0["scores"][j]),
                    "scores1": np.asarray(e1["scores"][j]),
                    "descriptors0": np.asarray(e0["descriptors"][j]),
                    "descriptors1": np.asarray(e1["descriptors"][j]),
                    "valid0": np.asarray(e0["valid"][j]),
                    "valid1": np.asarray(e1["valid"][j]),
                    "gt_matches0": gt,
                })
        n_gt = float(np.mean([int((f["gt_matches0"] >= 0).sum())
                              for f in feats]))
        log(f"SG training data ready: {len(feats)} pairs, "
            f"{n_gt:.0f} GT matches/pair ({time.time() - t0:.0f}s)")

        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(optax.piecewise_constant_schedule(
                1e-4, {int(args.sg_steps * 0.7): 0.1})))
        opt = tx.init(sg_params)
        sg_step = make_superglue_train_step(sg, tx)
        order = rng.permutation(len(feats))
        pos = 0
        for it in range(args.sg_steps):
            idx = [int(order[(pos + j) % len(feats)])
                   for j in range(args.sg_batch)]
            pos += args.sg_batch
            if pos >= len(feats):
                order = rng.permutation(len(feats))
                pos = 0
            batch = {key: jnp.asarray(np.stack([feats[i][key] for i in idx]))
                     for key in feats[0]}
            batch["image_hw0"] = (hw, hw)
            batch["image_hw1"] = (hw, hw)
            sg_params, opt, m = sg_step(sg_params, opt, batch)
            if it % 100 == 0:
                log(f"SG step {it} nll {float(m['loss']):.4f} "
                    f"({time.time() - t0:.0f}s)")
        maybe_save("superglue", sg_params)

    @jax.jit
    def _sg_match(data):
        return sg.apply(sg_params,
                        dict(data, image_hw0=(hw, hw), image_hw1=(hw, hw)))

    def sg_match(data):
        return _sg_match({key: v for key, v in data.items()
                          if not key.startswith("image_hw")})

    # ---- Phase 3: eval — SIFT+NN vs SP+NN vs SP+SG --------------------
    # SP features for all val pairs in chunks of 16 (padding the last
    # chunk) so extraction reuses the phase-2 batch-16 executable — every
    # distinct batch shape costs minutes of remote compile on axon.
    items = [val_ds[i] for i in range(len(val_ds))]
    val_feats = []
    CH = 16
    for start in range(0, len(items), CH):
        chunk = items[start:start + CH]
        pad = CH - len(chunk)
        e0, e1 = sp_data(chunk + [chunk[-1]] * pad)
        for j in range(len(chunk)):
            val_feats.append((
                {key: np.asarray(v[j]) for key, v in e0.items()},
                {key: np.asarray(v[j]) for key, v in e1.items()}))

    def repeatability(kp_of_pair, radius=3.0):
        """Detector repeatability@radius under the known depth+pose warp.

        Fraction of image0 detections that, once warped into image1,
        have an image1 detection within ``radius`` px (both directions
        averaged; only warps landing inside the frame count). This is
        the number VERDICT r4 identified as the cap on every downstream
        matcher table (0.21-0.37 for the shapes-only detector).
        """
        fracs = []
        for pi, it_ in enumerate(items):
            xy0, v0, xy1, v1 = kp_of_pair(pi, it_)
            T10 = it_["pose2"] @ np.linalg.inv(it_["pose1"])
            for (xa, va, xb, vb, Tab, da, Ka, Kb) in (
                    (xy0, v0, xy1, v1, T10, it_["depth1"],
                     it_["intrinsics1"], it_["intrinsics2"]),
                    (xy1, v1, xy0, v0, np.linalg.inv(T10), it_["depth2"],
                     it_["intrinsics2"], it_["intrinsics1"])):
                w, ok = warp_points_via_depth(
                    jnp.asarray(xa), da, Ka, Tab, Kb)
                w, ok = np.asarray(w), np.asarray(ok) & np.asarray(va)
                inb = (ok & (w[:, 0] >= 0) & (w[:, 0] <= hw - 1)
                       & (w[:, 1] >= 0) & (w[:, 1] <= hw - 1))
                if inb.sum() == 0:
                    continue
                d = np.linalg.norm(
                    w[inb][:, None] - np.asarray(xb)[None], axis=-1)
                d[:, ~np.asarray(vb)] = 1e9
                fracs.append(float((d.min(1) < radius).mean()))
        return round(float(np.mean(fracs)), 4)

    def sp_kp(pi, it_):
        e0, e1 = val_feats[pi]
        return (e0["keypoints"], e0["valid"], e1["keypoints"], e1["valid"])

    _sift_cache = {}

    def sift_kp(pi, it_):
        if pi not in _sift_cache:
            g0 = cv2.cvtColor((it_["image1"] * 255).astype(np.uint8),
                              cv2.COLOR_RGB2GRAY)
            g1 = cv2.cvtColor((it_["image2"] * 255).astype(np.uint8),
                              cv2.COLOR_RGB2GRAY)
            xy0, _, v0 = sift_keypoints(g0, k)[:3]
            xy1, _, v1 = sift_keypoints(g1, k)[:3]
            _sift_cache[pi] = (xy0, v0, xy1, v1)
        return _sift_cache[pi]

    def score(run_pair):
        errors, precisions, n_match = [], [], []
        for pi, it_ in enumerate(items):
            xy0, xy1, matches = run_pair(pi, it_)
            n_match.append(matches.shape[1])
            T = it_["pose2"] @ np.linalg.inv(it_["pose1"])
            res = validation_error(xy0, xy1, matches, it_["intrinsics1"],
                                   it_["intrinsics2"], T)
            errors.append(max(res["error_t"], res["error_R"]))
            precisions.append(res["precision"])
        aucs = pose_auc(errors, [5, 10, 20])
        # Bootstrap spread over pairs (VERDICT r4 weak #7: n=40 margins
        # were inside sampling noise; report sigma so gates are honest).
        bs = np.random.default_rng(7)
        errs = np.asarray(errors)
        sig = float(np.std([pose_auc(errs[bs.integers(0, len(errs),
                                                      len(errs))], [5])[0]
                            for _ in range(200)]))
        return {"auc@5": round(float(aucs[0]), 4),
                "auc@5_sigma": round(sig, 4),
                "auc@10": round(float(aucs[1]), 4),
                "auc@20": round(float(aucs[2]), 4),
                "precision": round(float(np.mean(precisions)), 4),
                "matches_per_pair": round(float(np.mean(n_match)), 1)}

    def sift_nn(pi, it_):
        g0 = cv2.cvtColor((it_["image1"] * 255).astype(np.uint8),
                          cv2.COLOR_RGB2GRAY)
        g1 = cv2.cvtColor((it_["image2"] * 255).astype(np.uint8),
                          cv2.COLOR_RGB2GRAY)
        xy0, _, v0, d0 = sift_keypoints(g0, k, with_descriptors=True)
        xy1, _, v1, d1 = sift_keypoints(g1, k, with_descriptors=True)
        m = nearest_neighbor_match(jnp.asarray(d0)[None],
                                   jnp.asarray(d1)[None],
                                   jnp.asarray(v0)[None],
                                   jnp.asarray(v1)[None],
                                   ratio_threshold=0.95)
        m0 = np.asarray(m["matches0"][0])
        sel = m0 > -1
        return xy0, xy1, np.stack([np.nonzero(sel)[0], m0[sel]])

    def sp_nn(pi, it_):
        e0, e1 = val_feats[pi]
        m = nearest_neighbor_match(jnp.asarray(e0["descriptors"])[None],
                                   jnp.asarray(e1["descriptors"])[None],
                                   jnp.asarray(e0["valid"])[None],
                                   jnp.asarray(e1["valid"])[None],
                                   ratio_threshold=0.95)
        m0 = np.asarray(m["matches0"][0])
        sel = (m0 > -1) & e0["valid"]
        return (e0["keypoints"], e1["keypoints"],
                np.stack([np.nonzero(sel)[0], m0[sel]]))

    # SG matching over the whole val set in batch-8 chunks (the phase-2
    # train-step shape is [8, K]; matching reuses nothing from it, but a
    # single batched executable beats 40 batch-1 compiles).
    sg_m0 = []
    for start in range(0, len(val_feats), args.sg_batch):
        chunk = val_feats[start:start + args.sg_batch]
        pad = args.sg_batch - len(chunk)
        padded = chunk + [chunk[-1]] * pad
        data = {
            "keypoints0": jnp.asarray(
                np.stack([c[0]["keypoints"] for c in padded])),
            "keypoints1": jnp.asarray(
                np.stack([c[1]["keypoints"] for c in padded])),
            "scores0": jnp.asarray(
                np.stack([c[0]["scores"] for c in padded])),
            "scores1": jnp.asarray(
                np.stack([c[1]["scores"] for c in padded])),
            "descriptors0": jnp.asarray(
                np.stack([c[0]["descriptors"] for c in padded])),
            "descriptors1": jnp.asarray(
                np.stack([c[1]["descriptors"] for c in padded])),
            "valid0": jnp.asarray(np.stack([c[0]["valid"] for c in padded])),
            "valid1": jnp.asarray(np.stack([c[1]["valid"] for c in padded])),
        }
        m = sg_match(data)
        for j in range(len(chunk)):
            sg_m0.append(np.asarray(m["matches0"][j]))

    def sp_sg(pi, it_):
        e0, e1 = val_feats[pi]
        m0 = sg_m0[pi]
        sel = (m0 > -1) & e0["valid"]
        return (e0["keypoints"], e1["keypoints"],
                np.stack([np.nonzero(sel)[0], m0[sel]]))

    rows = {"sift_nn": score(sift_nn), "sp_nn": score(sp_nn),
            "sp_sg": score(sp_sg)}
    rep = {"superpoint": repeatability(sp_kp),
           "sift": repeatability(sift_kp)}
    log(f"repeatability@3px: sp {rep['superpoint']} sift {rep['sift']}")

    # Held-out GT-assignment quality + the SP+SG >= SP+NN quality gate
    # (round-3 shipped an SG that *subtracted* value from its extractor;
    # this makes that regression visible in the artifact itself).
    def assign_pr(m0_of_pair):
        ps, rs = [], []
        for pi, it_ in enumerate(items):
            e0, e1 = val_feats[pi]
            T = it_["pose2"] @ np.linalg.inv(it_["pose1"])
            gt = gt_matches_from_geometry(
                e0["keypoints"], e0["valid"], e1["keypoints"], e1["valid"],
                it_["depth1"], it_["intrinsics1"], T, it_["intrinsics2"])
            m0 = m0_of_pair(pi)
            sel = (m0 > -1) & e0["valid"]
            has = (gt >= 0) & e0["valid"]
            ps.append(((m0 == gt) & sel).sum() / max(sel.sum(), 1))
            rs.append(((m0 == gt) & has).sum() / max(has.sum(), 1))
        return {"assign_precision": round(float(np.mean(ps)), 4),
                "assign_recall": round(float(np.mean(rs)), 4)}

    def nn_m0_of(pi):
        e0, e1 = val_feats[pi]
        m = nearest_neighbor_match(
            jnp.asarray(e0["descriptors"])[None],
            jnp.asarray(e1["descriptors"])[None],
            jnp.asarray(e0["valid"])[None], jnp.asarray(e1["valid"])[None],
            ratio_threshold=0.95)
        return np.asarray(m["matches0"][0])

    rows["sp_nn"].update(assign_pr(nn_m0_of))
    rows["sp_sg"].update(assign_pr(lambda pi: sg_m0[pi]))
    gate = (rows["sp_sg"]["precision"] >= rows["sp_nn"]["precision"]
            and rows["sp_sg"]["auc@5"] >= rows["sp_nn"]["auc@5"])

    print(json.dumps({
        "metric": "learned_matching_pose_auc",
        "sp_steps": args.sp_steps, "sg_steps": args.sg_steps,
        "hw": hw, "topk": k, "val_pairs": args.val_pairs,
        **rows,
        "repeatability@3px": rep,
        "sg_beats_nn_gate": bool(gate),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
