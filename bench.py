"""Benchmark: OETR overlap-estimation throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the flagship OETR forward (ResNet50 layer3, d=256, linear
attention, 640x640 pairs — the reference's eval input size,
/root/reference/scripts/evaluate_megadepth.sh:14-21) in bfloat16 at the
largest power-of-two batch that fits, steady-state.

vs_baseline: the reference publishes no throughput (BASELINE.md); the
denominator is the documented proxy of 40 pairs/s for its 2-GPU serial
pipeline (evaluation.py:303 runs batch=1 per pair). BASELINE.json's
target is >=10x per chip, i.e. vs_baseline >= 10 is the goal line.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 40.0


def main():
    from oetr_tpu.config import OETRConfig
    from oetr_tpu.models import build_oetr

    cfg = OETRConfig(dtype="bfloat16")
    model = build_oetr(cfg)
    img = jnp.zeros((1, 640, 640, 3), jnp.float32)
    # jit the init: one XLA compile instead of one eager dispatch per
    # primitive (the axon remote-compile path costs ~1s per op).
    params = jax.jit(model.init)(jax.random.key(0), img, img)

    @jax.jit
    def forward(image1, image2):
        out = model.apply(params, image1, image2, deterministic=True)
        return out["pred_bbox1"], out["pred_bbox2"]

    batch = 16
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), jnp.float32)
    im2 = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), jnp.float32)

    # Warmup / compile.
    jax.block_until_ready(forward(im1, im2))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(im1, im2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * iters / dt

    print(json.dumps({
        "metric": "oetr_overlap_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
