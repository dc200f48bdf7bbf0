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


def build_shipped_model(matcher: str = "superglue",
                        with_overlap: bool = False,
                        ckpt_root: str | None = None,
                        cfg: PipelineConfig | None = None):
    """Assemble a pipeline from the repo's committed trained checkpoints.

    The reference's ``build_model`` resolves every component to a
    *downloaded* checkpoint (dloc/core/extract_features.py:22,
    overlap_features.py:30-46); this is the equivalent surface for the
    from-scratch weights shipped in this repo (README "Shipped
    checkpoints"): SuperPoint+SuperGlue from ``.ckpt_matching_r5``,
    LoFTR from ``.ckpt_loftr_r5``, the flagship OETR overlaper from
    ``.ckpt_oetr_r5``. Model hyper-parameters are pinned to the shipped
    training configs (desc 128 / LoFTR d=192+96), which differ from the
    registry's reference-conf dims.

    Args:
      matcher: ``"superglue"`` (SP+SG sparse) or ``"loftr"`` (dense).
      with_overlap: prepend the trained OETR overlap gate.
      ckpt_root: directory holding the ``.ckpt_*`` dirs (default: the
        repo root this package sits in).
    Returns:
      (pipeline, config-dict) like :func:`build_model`.
    Raises:
      FileNotFoundError: when a required checkpoint dir is absent.
    """
    import os

    import orbax.checkpoint as ocp

    root = ckpt_root or os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".."))
    ck = ocp.StandardCheckpointer()

    def restore(rel, tmpl):
        path = os.path.join(root, rel)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"shipped checkpoint missing: {path} (train it via the "
                "scripts/ demos or pass explicit params to build_model)")
        return ck.restore(path, tmpl)

    cfg = cfg or PipelineConfig(box_source="heatmap")
    rng = jax.random.key(0)
    ch, cw = cfg.canvas_hw

    oetr = oetr_params = None
    if with_overlap:
        from ..config import oetr_r50_config
        from ..models import build_oetr
        oetr = build_oetr(oetr_r50_config())
        oh, ow = cfg.oetr_hw
        od = jnp.zeros((1, oh, ow, 3), jnp.float32)
        oetr_params = restore(".ckpt_oetr_r5/params",
                              jax.jit(oetr.init)(rng, od, od))

    if matcher == "loftr":
        from ..models.loftr import LoFTR
        lf = LoFTR(d_coarse=192, d_fine=96, coarse_layers=4,
                   max_matches=1024)
        dummy = jnp.zeros((1, ch, cw, 1), jnp.float32)
        lp = restore(".ckpt_loftr_r5/loftr",
                     jax.jit(lf.init)(rng, dummy, dummy))
        pipeline = DensePipeline(lf, lp, oetr, oetr_params, cfg)
        return pipeline, {"matcher": "loftr", "extractor": None,
                          "overlaper": "oetr" if with_overlap else None,
                          "config": cfg}

    if matcher != "superglue":
        raise ValueError(f"no shipped weights for matcher {matcher!r}")
    from ..models.superglue import SuperGlue
    from ..models.superpoint import SuperPoint, SuperPointNet

    desc, k = 128, 2048
    net = SuperPointNet(descriptor_dim=desc)
    raw = restore(".ckpt_matching_r5/superpoint",
                  jax.jit(net.init)(rng, jnp.zeros((1, 128, 128, 1))))
    sp = SuperPoint(max_keypoints=k, keypoint_threshold=0.0,
                    descriptor_dim=desc)
    sp_params = {"params": {"net": raw["params"]}}

    sg = SuperGlue(descriptor_dim=desc)
    dummy_data = {
        "keypoints0": jnp.zeros((1, k, 2)), "keypoints1": jnp.zeros((1, k, 2)),
        "scores0": jnp.zeros((1, k)), "scores1": jnp.zeros((1, k)),
        "descriptors0": jnp.zeros((1, k, desc)),
        "descriptors1": jnp.zeros((1, k, desc)),
        "valid0": jnp.ones((1, k), bool), "valid1": jnp.ones((1, k), bool),
    }
    # image_hw stays a static python tuple (jit would trace it and break
    # the keypoint normalization's max()).
    sg_params = restore(
        ".ckpt_matching_r5/superglue",
        jax.jit(lambda kk, dd: sg.init(
            kk, dict(dd, image_hw0=cfg.canvas_hw,
                     image_hw1=cfg.canvas_hw)))(rng, dummy_data))
    pipeline = SparsePipeline(sp, sp_params,
                              lambda data: sg.apply(sg_params, data),
                              oetr, oetr_params, cfg)
    return pipeline, {"matcher": "superglue", "extractor": "superpoint",
                      "overlaper": "oetr" if with_overlap else None,
                      "config": cfg}


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
