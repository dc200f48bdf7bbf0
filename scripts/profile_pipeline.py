#!/usr/bin/env python
"""Stage-split roofline of the north-star matching pipeline (bench stage 4).

VERDICT r3 weak #1: the 12.3 matched-pairs/s/chip number (OETR 640² ->
crop -> SuperPoint 832²x2 -> SuperGlue 2048, one jit program) had no
efficiency accounting — the OETR stage got the full per-stage SoL
treatment (scripts/profile_oetr.py) while the other ~79 ms/pair had
none. Method mirrors profile_oetr.py: time cumulative truncated
variants of the pipeline at the bench shape (batch 8, canvas 832,
k=2048, bf16), difference successive variants for per-stage time, pair
each with XLA cost analysis (flops + HBM bytes) for the stage's v5e
roofline. Additionally isolates the Sinkhorn cost by re-timing SuperGlue
at sinkhorn_iterations=1.

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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--canvas", type=int, default=832)
    ap.add_argument("--topk", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from oetr_tpu.config import oetr_r50_config, replace
    from oetr_tpu.models import build_oetr
    from oetr_tpu.models.superglue import SuperGlue
    from oetr_tpu.models.superpoint import SuperPoint, SuperPointNet, grayscale
    from oetr_tpu.ops.warp import crop_resize_batch
    from oetr_tpu.pipelines import PipelineConfig, SparsePipeline
    from oetr_tpu.pipelines.matching import gate_boxes
    from oetr_tpu.utils.profiling import (V5E_BF16_FLOPS,
                                          V5E_HBM_BYTES_PER_S)

    b, ch, k = args.batch, args.canvas, args.topk
    cw = ch
    rng = np.random.default_rng(0)

    cfg = replace(oetr_r50_config(), dtype="bfloat16")
    oetr = build_oetr(cfg)
    o_img = jnp.zeros((1, 640, 640, 3), jnp.float32)
    oetr_params = jax.jit(oetr.init)(jax.random.key(0), o_img, o_img)

    sp = SuperPoint(max_keypoints=k, dtype=jnp.bfloat16)
    sp_params = jax.jit(sp.init)(jax.random.key(1),
                                 jnp.zeros((1, ch, cw, 1), jnp.float32))
    spnet = SuperPointNet(descriptor_dim=256, dtype=jnp.bfloat16)
    spnet_params = {"params": sp_params["params"]["net"]}

    def make_sg(iters):
        sg = SuperGlue(dtype=jnp.bfloat16, sinkhorn_iterations=iters)
        dummy = {
            "keypoints0": jnp.zeros((1, k, 2)),
            "keypoints1": jnp.zeros((1, k, 2)),
            "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
            "descriptors0": jnp.zeros((1, k, sg.descriptor_dim)),
            "descriptors1": jnp.zeros((1, k, sg.descriptor_dim)),
            "valid0": jnp.ones((1, k), bool),
            "valid1": jnp.ones((1, k), bool),
        }
        params = jax.jit(lambda kk, dd: sg.init(
            kk, dict(dd, image_hw0=(ch, cw), image_hw1=(ch, cw))))(
                jax.random.key(2), dummy)
        return sg, params

    sg20, sg20_params = make_sg(20)

    # ---- inputs (bench stage-4 shapes) --------------------------------
    im0 = jnp.asarray(rng.uniform(0, 1, (b, ch, cw, 3)), jnp.float32)
    im1 = jnp.asarray(rng.uniform(0, 1, (b, ch, cw, 3)), jnp.float32)
    hw = jnp.full((b, 2), ch, jnp.int32)
    o0 = jnp.asarray(rng.uniform(0, 1, (b, 640, 640, 3)), jnp.float32)
    o1 = jnp.asarray(rng.uniform(0, 1, (b, 640, 640, 3)), jnp.float32)
    sc = jnp.full((b, 2), ch / 640.0, jnp.float32)
    pcfg = PipelineConfig(canvas_hw=(ch, cw), oetr_hw=(640, 640),
                          fallback_min_matches=0)

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

    # ---- cumulative truncated variants --------------------------------
    def v_oetr(o0_, o1_, sc0, sc1):
        out = oetr.apply(oetr_params, o0_, o1_, deterministic=True)
        s0 = jnp.concatenate([sc0, sc0], axis=-1)
        s1 = jnp.concatenate([sc1, sc1], axis=-1)
        return out["pred_bbox1"] * s0, out["pred_bbox2"] * s1

    def v_crop(i0, i1, h0, h1, o0_, o1_, sc0, sc1):
        b0, b1 = v_oetr(o0_, o1_, sc0, sc1)
        b0, b1, _ = gate_boxes(b0, b1, h0, h1, pcfg)
        c0, r0, _ = crop_resize_batch(i0, b0, (ch, cw))
        c1, r1, _ = crop_resize_batch(i1, b1, (ch, cw))
        return c0, c1, r0, r1

    def v_sptrunk(i0, i1, h0, h1, o0_, o1_, sc0, sc1):
        c0, c1, _, _ = v_crop(i0, i1, h0, h1, o0_, o1_, sc0, sc1)
        s0, d0 = spnet.apply(spnet_params, grayscale(c0))
        s1, d1 = spnet.apply(spnet_params, grayscale(c1))
        return s0, d0, s1, d1

    def v_spfull(i0, i1, h0, h1, o0_, o1_, sc0, sc1):
        c0, c1, _, _ = v_crop(i0, i1, h0, h1, o0_, o1_, sc0, sc1)
        e0 = sp.apply(sp_params, grayscale(c0))
        e1 = sp.apply(sp_params, grayscale(c1))
        return e0["keypoints"], e1["keypoints"], e0["descriptors"]

    def make_v_full(sg, sg_params):
        pipe_run = SparsePipeline(
            sp, sp_params, lambda d: sg.apply(sg_params, d),
            oetr=oetr, oetr_params=oetr_params, cfg=pcfg)

        def v_full(i0, i1, h0, h1, o0_, o1_, sc0, sc1):
            return pipe_run._run(i0, i1, h0, h1, o0_, o1_, sc0, sc1,
                                 use_overlap=True)["matches0"]
        return v_full

    variants = [
        ("oetr640", v_oetr, (o0, o1, sc, sc)),
        ("crop", v_crop, (im0, im1, hw, hw, o0, o1, sc, sc)),
        ("superpoint_trunk", v_sptrunk, (im0, im1, hw, hw, o0, o1, sc, sc)),
        ("superpoint_select", v_spfull, (im0, im1, hw, hw, o0, o1, sc, sc)),
        ("superglue+sinkhorn20", make_v_full(sg20, sg20_params),
         (im0, im1, hw, hw, o0, o1, sc, sc)),
    ]

    cum = []
    for name, fn, xs in variants:
        jfn = jax.jit(fn)
        t = timed(jfn, *xs)
        fl, by = cost(fn, *xs)
        cum.append((name, t, fl, by))
        print(f"# {name}: cumulative {t*1e3:.1f} ms", file=sys.stderr,
              flush=True)

    stages = []
    prev_t = prev_fl = prev_by = 0.0
    for name, t, fl, by in cum:
        dt, dfl, dby = t - prev_t, fl - prev_fl, by - prev_by
        t_sol = max(dfl / V5E_BF16_FLOPS, dby / V5E_HBM_BYTES_PER_S)
        stages.append({
            "stage": name, "ms": round(dt * 1e3, 2),
            "gflops": round(dfl / 1e9, 1),
            "gbytes": round(dby / 1e9, 3),
            "bound": ("compute" if dfl / V5E_BF16_FLOPS
                      >= dby / V5E_HBM_BYTES_PER_S else "memory"),
            "sol_ms": round(t_sol * 1e3, 2),
            "pct_of_sol": round(100 * t_sol / max(dt, 1e-9), 1),
        })
        prev_t, prev_fl, prev_by = t, fl, by

    # Sinkhorn isolation: full pipeline at 1 iteration vs 20.
    sg1, sg1_params = make_sg(1)
    t_sg1 = timed(jax.jit(make_v_full(sg1, sg1_params)),
                  im0, im1, hw, hw, o0, o1, sc, sc)
    sinkhorn_ms = (cum[-1][1] - t_sg1) * 1e3
    print(f"# sinkhorn(19 extra iters): {sinkhorn_ms:.1f} ms",
          file=sys.stderr, flush=True)

    t_full, fl_full = cum[-1][1], cum[-1][2]
    print(json.dumps({
        "metric": "pipeline_stage_profile",
        "batch": b, "canvas": ch, "topk": k,
        "matched_pairs_per_sec": round(b / t_full, 2),
        "ms_per_pair": round(t_full / b * 1e3, 1),
        "mfu_pct": round(100 * fl_full / t_full / V5E_BF16_FLOPS, 1),
        "stages": stages,
        "sinkhorn_extra19_ms": round(sinkhorn_ms, 2),
    }))


if __name__ == "__main__":
    main()
