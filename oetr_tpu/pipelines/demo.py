"""Single-pair overlap demo CLI — the reference test.py (24-56) parity.

Usage:
  python -m oetr_tpu.pipelines.demo --pairs pairs.txt --data /imgs \\
      --checkpoint ckpt_dir --step 0 --out viz/

Loads an OETR checkpoint, runs box prediction per pair, draws predicted
(+ optional GT) boxes side by side.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="OETR single-pair overlap demo")
    ap.add_argument("--pairs", required=True,
                    help="txt: name0 name1 [gt_box0(4) gt_box1(4)] per line")
    ap.add_argument("--data", default="")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--step", type=int, default=0)
    ap.add_argument("--out", default="overlap_viz")
    ap.add_argument("--size", type=int, default=640)
    args = ap.parse_args(argv)

    from ..config import OETRConfig, TrainConfig
    from ..data.images import prepare_image, read_image
    from ..models import build_oetr
    from ..training.train import create_train_state, load_checkpoint
    from ..utils.viz import visualize_overlap_gt

    hw = (args.size, args.size)
    cfg = OETRConfig()
    model, state, _ = create_train_state(cfg, TrainConfig(image_size=hw),
                                         jax.random.key(0), hw)
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint, args.step, state)

    apply = jax.jit(lambda p, a, b: model.apply(p, a, b, deterministic=True))
    os.makedirs(args.out, exist_ok=True)

    with open(args.pairs) as f:
        lines = [ln.split() for ln in f if ln.strip()]
    for fields in lines:
        name0, name1 = fields[0], fields[1]
        p0 = prepare_image(read_image(os.path.join(args.data, name0)),
                           hw, hw)
        p1 = prepare_image(read_image(os.path.join(args.data, name1)),
                           hw, hw)
        out = apply(state.params, jnp.asarray(p0.oetr_image)[None],
                    jnp.asarray(p1.oetr_image)[None])
        b0 = np.asarray(out["pred_bbox1"][0])
        b1 = np.asarray(out["pred_bbox2"][0])
        gt0 = (np.array(fields[2:6], float) if len(fields) >= 10
               else np.zeros(4))
        gt1 = (np.array(fields[6:10], float) if len(fields) >= 10
               else np.zeros(4))
        name = (os.path.basename(name0) + "_" + os.path.basename(name1)
                + ".png")
        visualize_overlap_gt(p0.oetr_image * 255, b0, gt0,
                             p1.oetr_image * 255, b1, gt1,
                             path=os.path.join(args.out, name))
        print(name, "box0", np.round(b0, 1), "box1", np.round(b1, 1))


if __name__ == "__main__":
    main()
