#!/usr/bin/env python
"""Flagship OETR forward A/B for round-4 kernel variants on the real
chip: baseline vs Pallas fused stem (ops/pallas_norm) vs whole-sublayer
fused linear attention (linear:pallas) vs both. One JSON line."""
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", type=str,
                    default="base,fused_stem,pallas_attn,both")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.config import oetr_r50_config, replace
    from oetr_tpu.models import build_oetr

    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 1, (args.batch, 640, 640, 3)),
                      jnp.float32)
    im2 = jnp.asarray(rng.uniform(0, 1, (args.batch, 640, 640, 3)),
                      jnp.float32)

    def build(name):
        cfg = replace(oetr_r50_config(), dtype="bfloat16")
        if name in ("fused_stem", "both"):
            cfg = replace(cfg, backbone=replace(cfg.backbone,
                                                fused_stem=True))
        if name in ("pallas_attn", "both"):
            cfg = replace(cfg, neck=replace(cfg.neck,
                                            attention="linear:pallas"))
        return cfg

    out = {"metric": "oetr_variant_ab", "batch": args.batch}
    base = None
    for name in args.variants.split(","):
        cfg = build(name)
        model = build_oetr(cfg)
        params = jax.jit(model.init)(jax.random.key(0), im1[:1], im2[:1])
        jax.block_until_ready(params)

        @jax.jit
        def fwd(a, b, model=model, params=params):
            o = model.apply(params, a, b, deterministic=True)
            return o["pred_bbox1"], o["pred_bbox2"]

        t0 = time.time()
        r = jax.block_until_ready(fwd(im1, im2))
        print(f"# {name}: compiled in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fwd(im1, im2)
        jax.block_until_ready(r)
        pps = args.batch * args.iters / (time.perf_counter() - t0)
        out[name] = round(pps, 1)
        if name == "base":
            base = np.asarray(r[0])
        elif base is not None:
            diff = float(np.max(np.abs(np.asarray(r[0]) - base)))
            out[f"{name}_max_bbox_diff_px"] = round(diff, 3)
        print(f"# {name}: {pps:.1f} pairs/s", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
