"""Benchmark: OETR overlap-estimation throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the flagship OETR forward (oetr_r50_config: ResNet50 layer3,
d=256, linear attention, 640x640 pairs — the reference's eval input
size, /root/reference/scripts/evaluate_megadepth.sh:14-21) in bfloat16,
steady-state.

Budget discipline (round-1 post-mortem: rc=124, no number recorded):
  * the XLA persistent compilation cache is enabled under .jax_cache/ so
    a warm run skips the 5-10 min axon remote compile entirely;
  * measurement is deadline-aware: batch-1 is compiled and timed first
    (small compile, guarantees *a* number), then batch 64 and 16 only
    while budget remains; exactly one JSON line is printed either way.

vs_baseline: denominator is the measured reference throughput from
BASELINE.md (reference OETR forward_dummy on this host's CPU via
scripts/measure_reference.py — the reference's 2-GPU rig is not
reproducible here and the repo publishes no throughput of its own).
"""
from __future__ import annotations

import json
import os
import time

T0 = time.perf_counter()
# Driver budget: leave headroom for process startup/teardown. The first
# forward on the axon tunnel costs 240-420 s even with a warm
# compilation cache (one-time executable + params load), so the budget
# must cover that plus one large-batch stage.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))

os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"),
            exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Measured on this host (see BASELINE.md "Measured baseline" and
# scripts/measure_reference.py): reference OETR forward_dummy, torch CPU.
BASELINE_PAIRS_PER_SEC = float(os.environ.get("BENCH_BASELINE", "0.89"))


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - T0)


def _log(msg: str) -> None:
    import sys
    print(f"[bench +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    from oetr_tpu.config import oetr_r50_config, replace
    from oetr_tpu.models import build_oetr

    cfg = replace(oetr_r50_config(), dtype="bfloat16")
    model = build_oetr(cfg)
    img = jnp.zeros((1, 640, 640, 3), jnp.float32)
    _log(f"imports done, devices={jax.devices()}")
    # jit the init: one XLA compile instead of one eager dispatch per
    # primitive (the axon remote-compile path costs ~1s per op).
    params = jax.jit(model.init)(jax.random.key(0), img, img)
    jax.block_until_ready(params)
    if os.environ.get("BENCH_BF16_PARAMS"):
        # Experiment (VERDICT r2 next-#6): bf16 param constants halve the
        # baked-constants executable (the 225 MB artifact behind the
        # 240-500 s warm-load worst case). Compute is already bf16 (flax
        # casts params per-op), so only norm-layer statistics change
        # precision; parity must be re-checked before making it default.
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        _log("params cast to bf16 constants")
    _log("init done")

    @jax.jit
    def forward(image1, image2):
        out = model.apply(params, image1, image2, deterministic=True)
        return out["pred_bbox1"], out["pred_bbox2"]

    rng = np.random.default_rng(0)

    def measure(batch: int, iters: int) -> float:
        im1 = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), jnp.float32)
        im2 = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), jnp.float32)
        _log(f"batch={batch}: inputs staged, compiling")
        jax.block_until_ready(forward(im1, im2))  # compile + warmup
        _log(f"batch={batch}: compiled, measuring")
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = forward(im1, im2)
        jax.block_until_ready(out)
        _log(f"batch={batch}: measured")
        return batch * iters / (time.perf_counter() - t0)

    # Stage 1: batch-1 — small compile, guarantees a recorded number.
    pairs_per_sec = measure(1, 8)
    batch_used = 1

    # Stages 2-3: larger batches, each gated on remaining budget (a cold
    # compile of a skipped stage can't sink the artifact; warm runs walk
    # all stages). Batch 64 measured +13% over 16 on v5e (PERF.md) and
    # goes first so a tight budget still captures the best number.
    for batch, iters in ((64, 5), (16, 10)):
        if _remaining() < 110.0:
            break
        try:
            pps = measure(batch, iters)
            if pps > pairs_per_sec:
                pairs_per_sec, batch_used = pps, batch
        except Exception:
            break  # keep the best number so far

    # Stage 4: the north-star metric (BASELINE.json) — the FULL matching
    # pipeline per chip: OETR overlap (640^2) -> crop-equalize ->
    # SuperPoint extract (832^2 canvas, fixed-k 2048) -> SuperGlue match,
    # i.e. what the reference's serial batch-1 loop does per pair
    # (/root/reference/evaluation.py:303). Budget-gated after the
    # guaranteed OETR stages; on a warm cache it always runs.
    full = None
    try:
        if _remaining() > 150.0:
            full = _measure_full_pipeline(model, params, rng)
    except Exception as e:  # noqa: BLE001 — never sink the artifact
        _log(f"full-pipeline stage failed: {type(e).__name__}: {e}")

    # Stage 5: the same pipeline with TRAINED weights, scene images and
    # the production fallback rule enabled (VERDICT r3 #7: the measured
    # program must execute the gate/fallback pattern production would).
    trained = None
    trained_status = "skipped_budget"
    try:
        if _remaining() > 120.0:
            trained, trained_status = _measure_full_pipeline_trained(
                model, params, rng)
    except Exception as e:  # noqa: BLE001
        trained_status = f"failed: {type(e).__name__}: {e}"
        _log(f"trained-pipeline stage failed: {type(e).__name__}: {e}")

    # Stage 6: the DENSE pipeline — the shipped fine-trained LoFTR
    # (BASELINE.md §7: pose-AUC parity with SIFT+NN), matched pairs/s on
    # one chip at the 256^2 eval protocol. Budget-gated last; warm runs
    # always reach it.
    dense = None
    try:
        if _remaining() > 90.0:
            dense = _measure_loftr(rng)
    except Exception as e:  # noqa: BLE001
        _log(f"dense-pipeline stage failed: {type(e).__name__}: {e}")

    result = {
        "metric": "oetr_overlap_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
        "batch": batch_used,
    }
    if full is not None:
        result["matched_pairs_per_sec_per_chip"] = full
    if dense is not None:
        result["dense_loftr_pairs_per_sec_per_chip"] = dense
    if trained is not None:
        result["matched_pairs_trained_weights_fallback"] = trained
    else:
        # The trained stage is part of the artifact contract — make its
        # absence loud rather than a silently smaller JSON (ADVICE r4).
        result["matched_pairs_trained_weights_fallback"] = {
            "status": trained_status}
        _log(f"TRAINED STAGE DID NOT RECORD A NUMBER: {trained_status}")
    print(json.dumps(result))


def _measure_loftr(rng):
    """Dense matcher throughput: shipped LoFTR forward, 256², batch 16.

    Loads the fine-trained checkpoint (.ckpt_loftr_r5/loftr) when
    present — random-init otherwise (identical compute graph, and the
    artifact says which ran).
    """
    import orbax.checkpoint as ocp

    from oetr_tpu.models.loftr import LoFTR

    root = os.path.dirname(os.path.abspath(__file__))
    hw, batch, iters = 256, 16, 10
    model = LoFTR(d_coarse=192, d_fine=96, coarse_layers=4,
                  max_matches=1024)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, hw, hw, 1)),
                                 jnp.zeros((1, hw, hw, 1)))
    ckpt = os.path.join(root, ".ckpt_loftr_r5", "loftr")
    weights = "random_init"
    if os.path.exists(ckpt):
        params = ocp.StandardCheckpointer().restore(ckpt, params)
        weights = "trained:.ckpt_loftr_r5"
    _log(f"dense stage: LoFTR params {weights}")

    @jax.jit
    def fwd(g0, g1):
        out = model.apply(params, g0, g1)
        return out["mkpts0"], out["mkpts1"], out["valid"]

    g0 = jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 1)), jnp.float32)
    g1 = jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 1)), jnp.float32)
    _log(f"dense stage: compiling (batch {batch})")
    jax.block_until_ready(fwd(g0, g1))
    _log("dense stage: compiled, measuring")
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fwd(g0, g1)
    jax.block_until_ready(out)
    pps = batch * iters / (time.perf_counter() - t0)
    _log(f"dense stage: {pps:.1f} pairs/s")
    return {"value": round(pps, 2), "unit": "pairs/s", "batch": batch,
            "hw": hw, "weights": weights,
            "stages": "loftr_coarse+dual_softmax+fine_refine"}


def _measure_full_pipeline(oetr_model, oetr_params, rng) -> dict:
    """Matched-pairs/s/chip: overlap + extract + match, end to end."""
    from oetr_tpu.models.superglue import SuperGlue
    from oetr_tpu.models.superpoint import SuperPoint
    from oetr_tpu.pipelines import PipelineConfig, SparsePipeline

    k = 2048
    ch = cw = 832
    pcfg = PipelineConfig(canvas_hw=(ch, cw), oetr_hw=(640, 640),
                          fallback_min_matches=0)  # no host-side retry:
    # random-init weights yield few matches; the retry path would bench
    # the fallback, not the pipeline.
    sp = SuperPoint(max_keypoints=k, dtype=jnp.bfloat16)
    sp_params = jax.jit(sp.init)(jax.random.key(1),
                                 jnp.zeros((1, ch, cw, 1), jnp.float32))
    sg = SuperGlue(dtype=jnp.bfloat16)
    dummy = {
        "keypoints0": jnp.zeros((1, k, 2)), "keypoints1": jnp.zeros((1, k, 2)),
        "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
        "descriptors0": jnp.zeros((1, k, sg.descriptor_dim)),
        "descriptors1": jnp.zeros((1, k, sg.descriptor_dim)),
        "valid0": jnp.ones((1, k), bool), "valid1": jnp.ones((1, k), bool),
    }
    # image_hw are shape statics — close over them, don't trace them.
    sg_params = jax.jit(lambda kk, dd: sg.init(
        kk, dict(dd, image_hw0=(ch, cw), image_hw1=(ch, cw))))(
            jax.random.key(2), dummy)
    jax.block_until_ready((sp_params, sg_params))
    _log("full-pipeline: SP+SG init done")
    pipe = SparsePipeline(sp, sp_params, lambda d: sg.apply(sg_params, d),
                          oetr=oetr_model, oetr_params=oetr_params, cfg=pcfg)

    def measure(batch: int, iters: int) -> float:
        im = jnp.asarray(rng.uniform(0, 1, (batch, ch, cw, 3)), jnp.float32)
        im2 = jnp.asarray(rng.uniform(0, 1, (batch, ch, cw, 3)), jnp.float32)
        hw = jnp.full((batch, 2), ch, jnp.int32)
        o0 = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), jnp.float32)
        o1 = jnp.asarray(rng.uniform(0, 1, (batch, 640, 640, 3)), jnp.float32)
        sc = jnp.full((batch, 2), ch / 640.0, jnp.float32)
        _log(f"full-pipeline batch={batch}: compiling")
        out = pipe(im, im2, hw, hw, o0, o1, sc, sc, with_overlap=True)
        jax.block_until_ready(out["matches0"])
        _log(f"full-pipeline batch={batch}: compiled, measuring")
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe(im, im2, hw, hw, o0, o1, sc, sc, with_overlap=True)
        jax.block_until_ready(out["matches0"])
        _log(f"full-pipeline batch={batch}: measured")
        return batch * iters / (time.perf_counter() - t0)

    best = measure(1, 4)
    batch_used = 1
    for batch, iters in ((16, 3), (8, 4)):
        if _remaining() < 110.0:
            break
        try:
            pps = measure(batch, iters)
            if pps > best:
                best, batch_used = pps, batch
        except Exception:
            break
    return {"value": round(best, 2), "unit": "pairs/s",
            "batch": batch_used, "canvas": ch, "keypoints": k,
            "stages": "oetr640+crop+superpoint832+superglue2048"}


def _measure_full_pipeline_trained(oetr_model, oetr_params, rng):
    """Stage 5: trained SP/SG checkpoints, on-device scene images, and
    fallback_min_matches=30 — the production execution pattern
    (overlap gate + low-match host retry actually firing).

    SP/SG weights come from the newest committed matching checkpoint
    (.ckpt_matching_r5, falling back to .ckpt_matching_r4). The OETR is
    the flagship model with the round-5 trained flagship params
    (.ckpt_oetr_r5/params) when present — otherwise it runs RANDOM-INIT
    and says so in the artifact (round 4 shipped this case silently;
    the gate statistics are only load-bearing with trained boxes).
    Returns (result_dict | None, status_str).
    """
    import orbax.checkpoint as ocp

    from oetr_tpu.data.device_synth import make_device_generator
    from oetr_tpu.models.superglue import SuperGlue
    from oetr_tpu.models.superpoint import SuperPoint, SuperPointNet
    from oetr_tpu.pipelines import PipelineConfig, SparsePipeline

    root = os.path.dirname(os.path.abspath(__file__))
    ckpt_dir = None
    for cand in (".ckpt_matching_r5", ".ckpt_matching_r4"):
        d = os.path.join(root, cand)
        if (os.path.exists(os.path.join(d, "superpoint"))
                and os.path.exists(os.path.join(d, "superglue"))):
            ckpt_dir = d
            break
    if ckpt_dir is None:
        _log("trained stage: NO SP/SG CHECKPOINTS FOUND "
             "(.ckpt_matching_r5 / .ckpt_matching_r4) — stage SKIPPED; "
             "retrain via scripts/train_matching_demo.py --device_data")
        return None, "skipped_no_matching_checkpoint"
    _log(f"trained stage: SP/SG from {os.path.basename(ckpt_dir)}")

    k, desc = 2048, 128
    ch = cw = 832
    ck = ocp.StandardCheckpointer()
    oetr_ckpt = os.path.join(root, ".ckpt_oetr_r5", "params")
    oetr_weights = "random_init"
    if os.path.exists(oetr_ckpt):
        oetr_params = ck.restore(oetr_ckpt, oetr_params)
        oetr_weights = "trained:.ckpt_oetr_r5"
        _log("trained stage: flagship OETR params restored (round-5 "
             "trained checkpoint)")
    else:
        _log("trained stage: no trained flagship OETR params "
             "(.ckpt_oetr_r5/params) — OETR boxes are RANDOM-INIT; the "
             "gate/fallback pattern is still exercised but its "
             "statistics are not production's")
    net = SuperPointNet(descriptor_dim=desc)
    sp_tmpl = jax.jit(net.init)(jax.random.key(0),
                                jnp.zeros((1, 128, 128, 1)))
    sp_raw = ck.restore(os.path.join(ckpt_dir, "superpoint"), sp_tmpl)
    sp = SuperPoint(max_keypoints=k, keypoint_threshold=0.0,
                    descriptor_dim=desc, dtype=jnp.bfloat16)
    sp_params = {"params": {"net": sp_raw["params"]}}

    sg = SuperGlue(descriptor_dim=desc, dtype=jnp.bfloat16)
    dummy = {
        "keypoints0": jnp.zeros((1, k, 2)), "keypoints1": jnp.zeros((1, k, 2)),
        "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
        "descriptors0": jnp.zeros((1, k, desc)),
        "descriptors1": jnp.zeros((1, k, desc)),
        "valid0": jnp.ones((1, k), bool), "valid1": jnp.ones((1, k), bool),
    }
    sg_tmpl = jax.jit(lambda kk, dd: sg.init(
        kk, dict(dd, image_hw0=(ch, cw), image_hw1=(ch, cw))))(
            jax.random.key(2), dummy)
    sg_params = ck.restore(os.path.join(ckpt_dir, "superglue"), sg_tmpl)
    _log("trained stage: checkpoints restored")

    # Heatmap box decode: the round-4/5 trained models' tlbr size head
    # hedges to full frame while the heatmap localizes (BASELINE.md §3)
    # — stage 5 runs the decode the trained A/B winner actually uses.
    pcfg = PipelineConfig(canvas_hw=(ch, cw), oetr_hw=(640, 640),
                          fallback_min_matches=30, box_source="heatmap")
    pipe = SparsePipeline(sp, sp_params, lambda d: sg.apply(sg_params, d),
                          oetr=oetr_model, oetr_params=oetr_params, cfg=pcfg)

    batch = 8
    gen = make_device_generator(ch, batch, scale_range=(1.0, 1.6),
                                p_translate=0.5)
    raw = gen(jax.random.key(7))
    im0 = jnp.asarray(raw["image1"], jnp.float32)
    im1 = jnp.asarray(raw["image2"], jnp.float32)
    hw = jnp.full((batch, 2), ch, jnp.int32)
    o0 = jax.image.resize(im0, (batch, 640, 640, 3), "bilinear")
    o1 = jax.image.resize(im1, (batch, 640, 640, 3), "bilinear")
    sc = jnp.full((batch, 2), ch / 640.0, jnp.float32)
    jax.block_until_ready((im0, o0))
    _log(f"trained stage: scene batch ready, compiling (batch {batch})")

    out = pipe(im0, im1, hw, hw, o0, o1, sc, sc, with_overlap=True)
    jax.block_until_ready(out["matches0"])
    n_match = np.asarray(out["num_matches"])
    used = np.asarray(out["used_overlap"])
    _log(f"trained stage: matches/pair {n_match.tolist()} "
         f"used_overlap {int(used.sum())}/{batch}")
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe(im0, im1, hw, hw, o0, o1, sc, sc, with_overlap=True)
    jax.block_until_ready(out["matches0"])
    pps = batch * iters / (time.perf_counter() - t0)
    return ({"value": round(pps, 2), "unit": "pairs/s", "batch": batch,
             "canvas": ch, "keypoints": k, "desc_dim": desc,
             "fallback_min_matches": 30,
             "oetr_weights": oetr_weights,
             "sp_sg_weights": os.path.basename(ckpt_dir),
             "mean_matches_per_pair": round(float(n_match.mean()), 1),
             "pairs_using_overlap": int(used.sum()),
             "stages": "oetr640+gate+crop+superpoint832+superglue2048"
                       "+fallback"}, "ok")


if __name__ == "__main__":
    main()
