#!/usr/bin/env python
"""Measure the reference OETR's throughput on this host (torch CPU).

Runs the *unmodified* reference model (/root/reference/src/model.py:38,
forward_dummy :229) via oetr_tpu.interop.refshim — its 2-GPU rig
(scripts/train.sh) is not reproducible here and the repo publishes no
throughput of its own (BASELINE.md), so the honest measurable denominator
is the reference code on the hardware available: this host's CPU.

Protocol: flagship config (ResNet50, layer3, 1024ch — matching
configs/baseline/oetr_config.py), batch 1 at 640x640 (the eval harness
runs pairs serially at batch 1, evaluation.py:303), inference_mode,
steady-state mean over --iters after --warmup.

Prints one JSON line; paste the result into BASELINE.md and
bench.py:BASELINE_PAIRS_PER_SEC.
"""
from __future__ import annotations

import argparse
import json
import time

import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = torch default)")
    args = ap.parse_args()

    if args.threads:
        torch.set_num_threads(args.threads)

    from oetr_tpu.interop.refshim import load_reference_oetr
    model = load_reference_oetr()

    im1 = torch.rand(args.batch, args.size, args.size, 3)
    im2 = torch.rand(args.batch, args.size, args.size, 3)

    with torch.inference_mode():
        for _ in range(args.warmup):
            model.forward_dummy(im1, im2)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            model.forward_dummy(im1, im2)
        dt = time.perf_counter() - t0

    pairs_per_sec = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "reference_oetr_pairs_per_sec_torch_cpu",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "batch": args.batch,
        "size": args.size,
        "threads": torch.get_num_threads(),
        "iters": args.iters,
    }))


if __name__ == "__main__":
    main()
