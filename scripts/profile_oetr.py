#!/usr/bin/env python
"""Per-stage profile of the flagship OETR forward on the TPU chip.

Answers VERDICT r2 weak #2 ("29% MFU with no per-layer evidence"): which
stages actually dominate, and is each dominant stage at its own
speed-of-light? Method: time truncated variants of the forward (stem ->
layer1 -> layer2 -> layer3 -> +neck -> full) at the bench shape
(batch 16, 640x640 pair, bf16), difference successive variants to get
per-stage time, and pair each with XLA's cost analysis (flops + HBM
bytes) to compute the stage's roofline bound on v5e. Also captures a
raw jax.profiler trace of the full forward into .profile_trace/ for
TensorBoard/Perfetto inspection.

Prints one JSON line with the per-stage table.
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace", action="store_true",
                    help="also capture a jax.profiler trace of the full "
                         "forward into .profile_trace/")
    args = ap.parse_args()

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.config import oetr_r50_config, replace
    from oetr_tpu.models import build_oetr
    from oetr_tpu.models.resnet import ResNetEncoder
    from oetr_tpu.models.oetr import PatchMerging
    from oetr_tpu.utils.profiling import (V5E_BF16_FLOPS,
                                          V5E_HBM_BYTES_PER_S, trace)

    cfg = replace(oetr_r50_config(), dtype="bfloat16")
    b, hw = args.batch, args.hw
    rng = np.random.default_rng(0)
    # The forward fuses both streams into one doubled batch (oetr.py),
    # so stage variants run on [2b, hw, hw, 3].
    img2b = jnp.asarray(rng.uniform(0, 1, (2 * b, hw, hw, 3)), jnp.float32)
    img = img2b[:b]

    def timed(fn, *xs, iters=args.iters):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    def cost(fn, *xs):
        c = jax.jit(fn).lower(*xs).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return (float(c.get("flops", 0.0)),
                float(c.get("bytes accessed", 0.0)))

    stages = []

    # Backbone truncations (cumulative).
    class Trunk(nn.Module):
        stop: str

        @nn.compact
        def __call__(self, x):
            return ResNetEncoder(depth=cfg.backbone.depth,
                                 stop_layer=self.stop,
                                 norm=cfg.backbone.norm,
                                 dtype=jnp.bfloat16, name="bb")(x)

    class TrunkNeck(nn.Module):
        @nn.compact
        def __call__(self, x):
            f = ResNetEncoder(depth=cfg.backbone.depth, stop_layer="layer3",
                              norm=cfg.backbone.norm, dtype=jnp.bfloat16,
                              name="bb")(x)
            f = nn.Conv(cfg.neck.d_model, (1, 1), dtype=jnp.bfloat16,
                        name="proj")(f)
            f = PatchMerging(cfg.neck.d_model, cfg.neck.patch_sizes,
                             dtype=jnp.bfloat16, name="pm")(f)
            return nn.Conv(cfg.neck.d_model, (1, 1), dtype=jnp.bfloat16,
                           name="proj2")(f)

    cum = []
    # (ResNetEncoder truncates at layer granularity; the stem is part of
    # the first row's delta, hence the label.)
    for stop in ("layer1", "layer2", "layer3"):
        m = Trunk(stop=stop)
        p = jax.jit(m.init)(jax.random.key(0), img2b[:1])
        # Params CLOSED OVER, not passed: argument-passed pytrees cost
        # ~0.5 s/call in marshalling on the tunneled backend and break
        # async timing (PERF.md methodology notes).
        f = jax.jit(lambda xx, m=m, p=p: m.apply(p, xx))
        t = timed(f, img2b)
        fl, by = cost(lambda xx, m=m, p=p: m.apply(p, xx), img2b)
        cum.append((stop, t, fl, by))
        print(f"# {stop}: cumulative {t*1e3:.1f} ms", file=sys.stderr,
              flush=True)

    mn = TrunkNeck()
    pn = jax.jit(mn.init)(jax.random.key(0), img2b[:1])
    fn_ = jax.jit(lambda xx: mn.apply(pn, xx))
    t_neck = timed(fn_, img2b)
    fl_n, by_n = cost(lambda xx: mn.apply(pn, xx), img2b)
    cum.append(("neck", t_neck, fl_n, by_n))
    print(f"# +neck: cumulative {t_neck*1e3:.1f} ms", file=sys.stderr,
          flush=True)

    model = build_oetr(cfg)
    params = jax.jit(model.init)(jax.random.key(0), img[:1], img[:1])
    full = jax.jit(lambda a, c: model.apply(params, a, c,
                                            deterministic=True))
    t_full = timed(full, img, img)
    fl_f, by_f = cost(lambda a, c: model.apply(params, a, c,
                                               deterministic=True),
                      img, img)
    cum.append(("full", t_full, fl_f, by_f))
    print(f"# full: {t_full*1e3:.1f} ms ({b} pairs)", file=sys.stderr,
          flush=True)

    cum[0] = ("stem+layer1",) + cum[0][1:]
    prev_t = prev_fl = prev_by = 0.0
    for name, t, fl, by in cum:
        dt, dfl, dby = t - prev_t, fl - prev_fl, by - prev_by
        t_sol = max(dfl / V5E_BF16_FLOPS, dby / V5E_HBM_BYTES_PER_S)
        stages.append({
            "stage": name,
            "ms": round(dt * 1e3, 2),
            "gflops": round(dfl / 1e9, 1),
            "gbytes": round(dby / 1e9, 3),
            "bound": ("compute" if dfl / V5E_BF16_FLOPS
                      >= dby / V5E_HBM_BYTES_PER_S else "memory"),
            "sol_ms": round(t_sol * 1e3, 2),
            "pct_of_sol": round(100 * t_sol / max(dt, 1e-9), 1),
        })
        prev_t, prev_fl, prev_by = t, fl, by

    if args.trace:
        tdir = os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                            ".profile_trace"))
        with trace(tdir):
            jax.block_until_ready(full(img, img))
        print(f"# trace written to {tdir}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "oetr_stage_profile",
        "batch": b, "hw": hw,
        "pairs_per_sec": round(b / t_full, 1),
        "mfu_pct": round(100 * fl_f / t_full / V5E_BF16_FLOPS, 1),
        "stages": stages,
    }))


if __name__ == "__main__":
    main()
