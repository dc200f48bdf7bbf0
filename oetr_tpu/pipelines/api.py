"""Public matching API — parity with the reference's dloc/api.py surface.

`build_model(extractor, matcher, ...)` -> (pipeline, config)      (api.py:71)
`get_matches(model, path0, path1, ...)` -> kpts/matches/conf      (api.py:107)
`get_pose(...)` -> homography/similarity on mutual matches        (api.py:181)

The heavy lifting is the batched pipeline in pipelines/matching.py; this
module is the single-pair convenience layer for dloc users (paths in,
numpy out).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.homography import ransac_homography
from ..models import registry
from .matching import DensePipeline, PipelineConfig, SparsePipeline
from ..data.images import batch_pairs, prepare_image, read_image


def build_model(extractor: str = "superpoint_aachen",
                matcher: str = "superglue_outdoor",
                overlaper: str | None = None,
                rng_seed: int = 0,
                cfg: PipelineConfig | None = None,
                params: dict | None = None):
    """Assemble a pipeline from registry names (ref: dloc/api.py:71-104).

    ``params`` may carry trained weights per component
    ({'extractor': ..., 'matcher': ..., 'oetr': ...}); without them the
    modules are randomly initialized (weight-loading policy: SURVEY.md §7
    "pretrained-weight gap").
    """
    cfg = cfg or PipelineConfig()
    params = params or {}
    rng = jax.random.key(rng_seed)
    ch, cw = cfg.canvas_hw
    dummy = jnp.zeros((1, ch, cw, 1), jnp.float32)

    oetr = oetr_params = None
    if overlaper is not None:
        oetr = registry.build(overlaper)
        oh, ow = cfg.oetr_hw
        od = jnp.zeros((1, oh, ow, 3), jnp.float32)
        oetr_params = params.get("oetr") or oetr.init(rng, od, od)

    if matcher == "loftr":
        loftr = registry.build("loftr")
        lp = params.get("matcher") or loftr.init(rng, dummy, dummy)
        pipeline = DensePipeline(loftr, lp, oetr, oetr_params, cfg)
        return pipeline, {"matcher": "loftr", "extractor": None,
                          "overlaper": overlaper, "config": cfg}

    ex = registry.build(extractor)
    ex_params = params.get("extractor") or ex.init(rng, dummy)

    entry = registry.get(matcher)
    if matcher.startswith("superglue"):
        sg = registry.build(matcher)
        k = ex.max_keypoints
        dummy_data = {
            "keypoints0": jnp.zeros((1, k, 2)), "keypoints1": jnp.zeros((1, k, 2)),
            "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
            "descriptors0": jnp.zeros((1, k, sg.descriptor_dim)),
            "descriptors1": jnp.zeros((1, k, sg.descriptor_dim)),
            "valid0": jnp.ones((1, k), bool), "valid1": jnp.ones((1, k), bool),
            "image_hw0": cfg.canvas_hw, "image_hw1": cfg.canvas_hw,
        }
        sg_params = params.get("matcher") or sg.init(rng, dummy_data)
        match_fn = lambda data: sg.apply(sg_params, data)
    else:                                    # 'NN' functional matcher
        match_fn = registry.build(matcher)

    pipeline = SparsePipeline(ex, ex_params, match_fn, oetr, oetr_params, cfg)
    return pipeline, {"matcher": matcher, "extractor": extractor,
                      "overlaper": overlaper, "config": cfg}


def get_matches(model, name0: str, name1: str, with_overlap: bool = True,
                resize_max: int | None = 1024):
    """Match one image pair by path (ref: dloc/api.py:107-178).

    Returns dict with kpts0, kpts1, matches [2, M], confidence — numpy,
    in original image pixel coordinates.
    """
    pipeline, conf = model
    cfg = conf["config"]
    p0 = prepare_image(read_image(name0), cfg.canvas_hw, cfg.oetr_hw,
                       resize_max)
    p1 = prepare_image(read_image(name1), cfg.canvas_hw, cfg.oetr_hw,
                       resize_max)
    batch = batch_pairs([p0], [p1])
    out = pipeline(
        jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
        jnp.asarray(batch["full_hw0"]), jnp.asarray(batch["full_hw1"]),
        jnp.asarray(batch["oetr_img0"]), jnp.asarray(batch["oetr_img1"]),
        jnp.asarray(batch["scales0"]), jnp.asarray(batch["scales1"]),
        with_overlap=with_overlap)

    s0 = batch["scale_to_orig0"][0]
    s1 = batch["scale_to_orig1"][0]
    if "mkpts0" in out:                      # dense (LoFTR)
        valid = np.asarray(out["valid"][0])
        k0 = np.asarray(out["mkpts0"][0])[valid] * s0
        k1 = np.asarray(out["mkpts1"][0])[valid] * s1
        conf_v = np.asarray(out["conf"][0])[valid]
        m = np.stack([np.arange(len(k0)), np.arange(len(k0))])
        return {"kpts0": k0, "kpts1": k1, "matches": m, "confidence": conf_v}

    k0 = np.asarray(out["keypoints0"][0]) * s0
    k1 = np.asarray(out["keypoints1"][0]) * s1
    matches0 = np.asarray(out["matches0"][0])
    valid0 = np.asarray(out["valid0"][0])
    sel = (matches0 > -1) & valid0
    idx0 = np.nonzero(sel)[0]
    idx1 = matches0[sel]
    conf_v = (np.asarray(out["matching_scores0"][0])[sel]
              if out.get("matching_scores0") is not None
              else np.ones(len(idx0)))
    return {"kpts0": k0, "kpts1": k1,
            "matches": np.stack([idx0, idx1]), "confidence": conf_v,
            "all_valid0": valid0, "all_valid1": np.asarray(out["valid1"][0])}


def get_pose(matches_dict: dict, model: str = "homography",
             threshold_px: float = 3.0, rng_seed: int = 0):
    """Planar model from mutual matches (ref: dloc/api.py:181-224, which
    uses cv2.findHomography / estimateAffinePartial2D)."""
    k0 = matches_dict["kpts0"]
    k1 = matches_dict["kpts1"]
    m = matches_dict["matches"]
    p0 = k0[m[0]]
    p1 = k1[m[1]]
    n = len(p0)
    pad = max(8, int(2 ** np.ceil(np.log2(max(n, 8)))))
    p0p = np.zeros((pad, 2), np.float32)
    p1p = np.zeros((pad, 2), np.float32)
    p0p[:n], p1p[:n] = p0, p1
    valid = np.zeros(pad, bool)
    valid[:n] = True
    res = ransac_homography(jnp.asarray(p0p), jnp.asarray(p1p),
                            jnp.asarray(valid), threshold_px,
                            jax.random.key(rng_seed), model=model)
    return {"H": np.asarray(res["H"]),
            "inliers": np.asarray(res["inliers"])[:n],
            "ok": bool(res["ok"])}
