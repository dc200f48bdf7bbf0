#!/usr/bin/env python
"""Export params-only artifact checkpoints from full TrainState dirs.

Training checkpoints (scripts/overlap_ab_demo.py --ckpt_dir,
training/train.save_checkpoint) hold params + adam moments + step —
3x the artifact size and useless to inference consumers. This exports
the LATEST step's params subtree to a standalone orbax dir that
bench.py / the pipelines restore directly (round-4 post-mortem: the
A/B winner's final state was never committed and is gone; the
committed artifact is now exactly the small thing the benches load).

Usage: python scripts/export_params.py <train_ckpt_dir> <out_dir> \
           [--depth 50 --d_model 256 --layers 4 --dec_layers 2 --hw 256]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dec_layers", type=int, default=2)
    ap.add_argument("--hw", type=int, default=256,
                    help="training image size (sets the PE max_shape the "
                         "state was created with)")
    args = ap.parse_args()

    # Host task: never touch the accelerator (and the ambient
    # environment may pin an accelerator platform — override it).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.training import create_train_state
    from oetr_tpu.training.train import latest_checkpoint_step, load_checkpoint

    tokens = args.hw // 32
    cfg = OETRConfig(
        backbone=BackboneConfig(depth=args.depth, stop_layer="layer3",
                                last_layer=256 if args.depth == 18 else 1024),
        neck=NeckConfig(d_model=args.d_model, nhead=8,
                        num_layers=args.layers,
                        num_decoder_layers=args.dec_layers,
                        max_shape=(tokens, tokens)))
    _, state, _ = create_train_state(cfg, TrainConfig(batch_size=1,
                                                      image_size=(args.hw,
                                                                  args.hw)),
                                     jax.random.key(0), (args.hw, args.hw))
    step = latest_checkpoint_step(args.src)
    if step is None:
        raise SystemExit(f"no step_N checkpoints under {args.src}")
    state = load_checkpoint(os.path.abspath(args.src), step, state)
    print(f"loaded step {step} from {args.src}")

    out = os.path.abspath(os.path.join(args.out, "params"))
    ck = ocp.StandardCheckpointer()
    ck.save(out, jax.tree.map(jnp.asarray, state.params))
    ck.wait_until_finished()
    n = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"exported {n / 1e6:.1f}M params -> {out}")


if __name__ == "__main__":
    main()
