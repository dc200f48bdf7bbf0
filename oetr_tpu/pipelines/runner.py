"""Benchmark matching runner — the reference evaluation.py driver,
batched.

Runs a pipeline over an eval pair list, batching pairs (instead of the
reference's serial batch=1 loop, /root/reference/evaluation.py:303) and
writes per-scene h5 results in the reference's format
(keypoints/matches/inparams/scales, evaluation.py:227-269,446-460) so
either side's eval scripts can score them.

NB on ``inparams``: the reference writes them for methods whose saved
keypoints remain in the crop/resize frame, and the eval side then adjusts
K (dloc/evaluate/utils/evaluation.py:305-323). This runner un-warps
keypoints all the way to the ORIGINAL image frame, so no correction is
needed and inparams are only written when ``write_inparams=True``
(recorded as (sx, sy, tx, ty, rx, ry): resize scale, crop origin,
crop->canvas ratio) for diagnostic cross-checks.
"""
from __future__ import annotations

import os
from collections import defaultdict

import jax.numpy as jnp
import numpy as np

from ..data.images import batch_pairs, prepare_image, read_image
from ..data.pairs import load_eval_pairs
from ..utils.h5io import pair_key, save_scene_results, stem


def _scene_of(name: str) -> str:
    parts = name.split("/")
    if len(parts) > 2:
        return parts[1]          # dataset/scene/.../img (MegaDepth, IMC)
    if len(parts) == 2:
        return parts[0]          # seq/img (HPatches)
    return "."


def _native_batch(paths0, paths1, cfg, resize_max):
    """Assemble the pipeline batch via the C++ data service (threaded
    JPEG decode + resize, data/native.py) — same arrays as the Python
    prepare_image path (parity pinned by tests/test_native.py)."""
    from ..data.native import prepare_batch_native

    out = {}
    for side, paths in (("0", paths0), ("1", paths1)):
        b = prepare_batch_native(paths, cfg.canvas_hw, cfg.oetr_hw,
                                 resize_max)
        out["image" + side] = b["canvas"]
        out["full_hw" + side] = b["valid_hw"]
        out["oetr_img" + side] = b["oetr_image"]
        out["scales" + side] = b["oetr_scale"]
        out["scale_to_orig" + side] = b["scale_to_orig"]
    return out


def run_benchmark(pipeline, pairs_file: str, dataset_path: str,
                  results_dir: str, batch_size: int = 8,
                  with_overlap: bool = True, resize_max: int | None = 1024,
                  pairwise: bool = True, write_inparams: bool = False,
                  use_native: bool = False) -> dict:
    """Match every pair; write per-scene h5; return simple run stats.

    ``use_native=True`` routes image loading through the C++ data
    service (threaded decode; falls back to Python if unavailable).
    """
    cfg = pipeline.cfg
    pairs = load_eval_pairs(pairs_file)
    by_scene_kpts: dict[str, dict] = defaultdict(dict)
    by_scene_matches: dict[str, dict] = defaultdict(dict)
    by_scene_inparams: dict[str, dict] = defaultdict(dict)
    n_matches_total = 0

    if use_native:
        from ..data.native import native_available
        use_native = native_available()

    for start in range(0, len(pairs), batch_size):
        chunk = pairs[start:start + batch_size]
        if use_native:
            batch = _native_batch(
                [os.path.join(dataset_path, p.name0) for p in chunk],
                [os.path.join(dataset_path, p.name1) for p in chunk],
                cfg, resize_max)
        else:
            p0s = [prepare_image(
                read_image(os.path.join(dataset_path, p.name0)),
                cfg.canvas_hw, cfg.oetr_hw, resize_max) for p in chunk]
            p1s = [prepare_image(
                read_image(os.path.join(dataset_path, p.name1)),
                cfg.canvas_hw, cfg.oetr_hw, resize_max) for p in chunk]
            batch = batch_pairs(p0s, p1s)
        out = pipeline(
            jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
            jnp.asarray(batch["full_hw0"]), jnp.asarray(batch["full_hw1"]),
            jnp.asarray(batch["oetr_img0"]), jnp.asarray(batch["oetr_img1"]),
            jnp.asarray(batch["scales0"]), jnp.asarray(batch["scales1"]),
            with_overlap=with_overlap)

        for i, p in enumerate(chunk):
            scene = _scene_of(p.name0)
            s0 = batch["scale_to_orig0"][i]
            s1 = batch["scale_to_orig1"][i]
            if "mkpts0" in out:                       # dense
                v = np.asarray(out["valid"][i])
                k0 = np.asarray(out["mkpts0"][i])[v] * s0
                k1 = np.asarray(out["mkpts1"][i])[v] * s1
                m = np.stack([np.arange(len(k0)), np.arange(len(k0))])
            else:
                k0_all = np.asarray(out["keypoints0"][i]) * s0
                k1_all = np.asarray(out["keypoints1"][i]) * s1
                matches0 = np.asarray(out["matches0"][i])
                valid0 = np.asarray(out["valid0"][i])
                sel = (matches0 > -1) & valid0
                idx0 = np.nonzero(sel)[0]
                idx1 = matches0[sel]
                k0, k1 = k0_all, k1_all
                m = np.stack([idx0, idx1])
            n_matches_total += m.shape[1]

            key01 = pair_key(p.name0, p.name1)
            key10 = pair_key(p.name1, p.name0)
            if pairwise:
                by_scene_kpts[scene][key01] = k0
                by_scene_kpts[scene][key10] = k1
            else:
                by_scene_kpts[scene].setdefault(stem(p.name0), k0)
                by_scene_kpts[scene].setdefault(stem(p.name1), k1)
            by_scene_matches[scene][key01] = m
            if write_inparams:
                bbox0 = np.asarray(out["bbox0"][i])
                bbox1 = np.asarray(out["bbox1"][i])
                r0 = float(np.asarray(out["ratio0"][i]))
                r1 = float(np.asarray(out["ratio1"][i]))
                by_scene_inparams[scene][key01] = np.array(
                    [s0[0], s0[1], bbox0[0], bbox0[1], r0, r0], np.float64)
                by_scene_inparams[scene][key10] = np.array(
                    [s1[0], s1[1], bbox1[0], bbox1[1], r1, r1], np.float64)

    for scene in by_scene_matches:
        save_scene_results(results_dir, scene, by_scene_kpts[scene],
                           by_scene_matches[scene],
                           inparams=(by_scene_inparams[scene]
                                     if write_inparams else None))
    return {
        "num_pairs": len(pairs),
        "num_scenes": len(by_scene_matches),
        "matches_per_pair": n_matches_total / max(len(pairs), 1),
    }
