"""Model registry: named extractor / matcher / overlap configurations.

Functional re-think of the reference's plugin system — conf dicts +
reflection (`dynamic_load`/`BaseModel`, /root/reference/dloc/core/utils/
base_model.py:8-47) become typed factory entries keyed by the same conf
names (dloc/core/extract_features.py:22-128, match_features.py:23-107,
overlap_features.py:20-46) so dloc users find their configurations here.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class ModelEntry:
    kind: str                      # 'extractor' | 'matcher' | 'overlap'
    factory: Callable[..., Any]    # flax module factory
    defaults: dict = field(default_factory=dict)
    note: str = ""


_REGISTRY: dict[str, ModelEntry] = {}


def register(name: str, entry: ModelEntry) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate registry entry {name!r}")
    _REGISTRY[name] = entry


def get(name: str) -> ModelEntry:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model conf {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build(name: str, **overrides):
    """Instantiate the flax module for a named conf."""
    e = get(name)
    kwargs = dict(e.defaults)
    kwargs.update(overrides)
    return e.factory(**kwargs)


def names(kind: str | None = None) -> list[str]:
    return sorted(n for n, e in _REGISTRY.items()
                  if kind is None or e.kind == kind)


def _populate() -> None:
    from .aslfeat import ASLFeat
    from .d2net import D2Net
    from .disk import DISK
    from .loftr import LoFTR
    from .oetr import OETR, build_oetr
    from .r2d2 import R2D2
    from .superglue import SuperGlue
    from .superpoint import SuperPoint

    # Extractors (conf parity: dloc/core/extract_features.py:22-128).
    register("superpoint_aachen", ModelEntry(
        "extractor", SuperPoint,
        dict(nms_radius=3, max_keypoints=2048, keypoint_threshold=0.005),
        "feats-superpoint-n2048-r1024"))
    register("superpoint_inloc", ModelEntry(
        "extractor", SuperPoint,
        dict(nms_radius=4, max_keypoints=4096),
        "feats-superpoint-n4096-r1600"))
    register("d2net-ss", ModelEntry(
        "extractor", D2Net, dict(max_keypoints=2048), "feats-d2net-ss"))
    register("r2d2-desc", ModelEntry(
        "extractor", R2D2,
        dict(reliability_thr=0.7, repeatability_thr=0.7, max_keypoints=5000),
        "feats-r2d2-desc"))
    register("disk-desc", ModelEntry(
        "extractor", DISK, dict(max_keypoints=2048), "feats-disk-desc"))
    register("aslfeat-desc", ModelEntry(
        "extractor", ASLFeat, dict(max_keypoints=2048),
        "feats-aslfeat-desc"))
    # Host-side SIFT-family extractors (conf parity:
    # dloc/core/extractors/landmark.py:17-40, contextdesc.py:22-70).
    from .sift_based import contextdesc_extract, landmark_extract

    register("landmark", ModelEntry(
        "extractor", lambda **kw: (lambda image_u8: landmark_extract(
            image_u8, **kw)),
        dict(topk=2048), "feats-landmark-sift"))
    register("contextdesc", ModelEntry(
        "extractor", lambda **kw: (lambda image_u8: contextdesc_extract(
            image_u8, **kw)),
        dict(topk=2048), "feats-contextdesc"))

    # Matchers (conf parity: dloc/core/match_features.py:23-107).
    register("superglue_outdoor", ModelEntry(
        "matcher", SuperGlue,
        dict(sinkhorn_iterations=30, match_threshold=0.2),
        "matches-superglue-outdoor"))
    register("superglue_indoor", ModelEntry(
        "matcher", SuperGlue,
        dict(sinkhorn_iterations=20),
        "matches-superglue-indoor"))
    register("superglue_disk", ModelEntry(
        "matcher", SuperGlue,
        dict(descriptor_dim=128, keypoint_encoder_layers=(32, 64, 128),
             sinkhorn_iterations=30, match_threshold=0.2),
        "matches-superglue-disk"))
    register("loftr", ModelEntry(
        "matcher", LoFTR, {}, "matches-loftr"))
    # 'NN' is a pure function, wrapped for uniformity.
    from .matchers import nearest_neighbor_match

    register("NN", ModelEntry(
        "matcher", lambda **kw: (lambda data: nearest_neighbor_match(
            data["descriptors0"], data["descriptors1"],
            data.get("valid0"), data.get("valid1"), **kw)),
        dict(distance_threshold=0.7, do_mutual_check=True),
        "matches-NN-mutual-dist.7"))

    from .cotr import COTR

    register("cotr", ModelEntry(
        "matcher", COTR, {}, "matches-cotr"))

    # Dedicated DISK brute-force matcher: cycle-consistent L2 NN with
    # DISK's rt ratio margin (ref: dloc/core/matchers/disk_match.py:20-40).
    from .matchers import disk_brute_match

    register("disk", ModelEntry(
        "matcher", lambda **kw: (lambda data: disk_brute_match(
            data["descriptors0"], data["descriptors1"],
            data.get("valid0"), data.get("valid1"), **kw)),
        dict(rt=0.1), "matches-disk-brute-force"))

    # Contour-ICP rigid matcher (conf parity: dloc/core/matchers/icp.py:16).
    from .icp import icp_match

    register("icp", ModelEntry(
        "matcher", lambda **kw: (lambda image0_u8, image1_u8: icp_match(
            image0_u8, image1_u8, **kw)),
        {}, "matches-icp"))

    # Overlap estimators (conf parity: dloc/core/overlap_features.py:20-46).
    register("oetr", ModelEntry(
        "overlap", lambda **kw: build_oetr(**kw), {}, "overlap-oetr"))


_populate()
