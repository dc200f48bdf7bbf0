#!/usr/bin/env python
"""From-scratch training demo: synthetic scenes -> OETR -> IoU recall.

The accuracy-evidence run for BASELINE.md: no released weights exist, so
this trains a small OETR from random init on procedurally generated
two-view pairs (data/synthetic.py — constant-depth planes under camera
translation, exact GT overlap boxes via the real data/geometry path) and
reports the IoU-recall table (validation.py semantics,
/root/reference/src/utils/validation.py:53) before and after training.

Prints one JSON line. Designed to run on the TPU chip (uses the shared
persistent compilation cache) or CPU with --steps trimmed.
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--train_pairs", type=int, default=192)
    ap.add_argument("--val_pairs", type=int, default=48)
    ap.add_argument("--hw", type=int, default=160)
    ap.add_argument("--lr", type=float, default=2e-4)
    args = ap.parse_args()

    import numpy as np

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.data.megadepth import MegaDepthPairsDataset
    from oetr_tpu.data.synthetic import generate_scene
    from oetr_tpu.training import create_train_state, make_train_step
    from oetr_tpu.training.validation import evaluate

    t0 = time.time()
    tmp = tempfile.mkdtemp(prefix="oetr_synth_")
    train_txt = generate_scene(os.path.join(tmp, "train"),
                               n_pairs=args.train_pairs, image_hw=args.hw,
                               seed=0)
    val_txt = generate_scene(os.path.join(tmp, "val"),
                             n_pairs=args.val_pairs, image_hw=args.hw,
                             seed=999)
    train_ds = MegaDepthPairsDataset(os.path.join(tmp, "train"), train_txt,
                                     image_size=(args.hw, args.hw),
                                     train=True)
    val_ds = MegaDepthPairsDataset(os.path.join(tmp, "val"), val_txt,
                                   image_size=(args.hw, args.hw),
                                   train=False)

    model_cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3",
                                last_layer=256),
        neck=NeckConfig(d_model=64, nhead=8, num_layers=2,
                        num_decoder_layers=2, max_shape=(16, 16)))
    train_cfg = TrainConfig(batch_size=args.batch,
                            image_size=(args.hw, args.hw), lr=args.lr,
                            lr_milestones=(10**6,))
    model, state, tx = create_train_state(model_cfg, train_cfg,
                                          jax.random.key(0),
                                          (args.hw, args.hw))
    step_fn = make_train_step(model, tx, cycle=True)

    def recall():
        return evaluate(model, state.params, val_ds.batches(args.batch))

    r_init = recall()
    print(f"# init recall: {r_init}", file=sys.stderr, flush=True)

    rng = jax.random.key(1)
    it = 0
    losses = []
    while it < args.steps:
        train_ds.build_dataset()
        for batch in train_ds.batches(args.batch):
            if it >= args.steps:
                break
            rng, drop = jax.random.split(rng)
            state, metrics = step_fn(state, batch, drop)
            losses.append(float(metrics["loss"]))
            if it % 25 == 0:
                print(f"# step {it} loss {losses[-1]:.4f} "
                      f"iou {float(metrics['iou1']):.3f} "
                      f"({time.time() - t0:.0f}s)",
                      file=sys.stderr, flush=True)
            it += 1

    r_final = recall()
    print(json.dumps({
        "metric": "synthetic_overlap_iou_recall",
        "steps": args.steps, "batch": args.batch, "hw": args.hw,
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
        "init": {k: round(float(v), 4) for k, v in r_init.items()
                 if np.ndim(v) == 0},
        "final": {k: round(float(v), 4) for k, v in r_final.items()
                  if np.ndim(v) == 0},
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
