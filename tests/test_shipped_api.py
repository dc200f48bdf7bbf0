"""build_shipped_model: the one-call trained-weights API.

Mirrors the reference's build_model-with-downloaded-weights UX
(dloc/api.py:71-104 + conf weight paths) on the repo's committed
from-scratch checkpoints. Skips cleanly on a checkout without them.
"""
import os

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _have(*rels):
    return all(os.path.exists(os.path.join(ROOT, r)) for r in rels)


@pytest.mark.slow
def test_shipped_loftr_pipeline_matches_pair(tmp_path):
    if not _have(".ckpt_loftr_r5/loftr"):
        pytest.skip("no shipped LoFTR checkpoint")
    import cv2

    from oetr_tpu.data.synthetic import _texture
    from oetr_tpu.pipelines import PipelineConfig, build_shipped_model
    from oetr_tpu.pipelines.api import get_matches

    cfg = PipelineConfig(canvas_hw=(256, 256), oetr_hw=(256, 256))
    model = build_shipped_model("loftr", cfg=cfg)
    g = _texture(np.random.default_rng(11), 256, 256)
    p0 = str(tmp_path / "a.png")
    p1 = str(tmp_path / "b.png")
    cv2.imwrite(p0, g[..., ::-1])
    cv2.imwrite(p1, np.roll(g, 8, axis=1)[..., ::-1])
    out = get_matches(model, p0, p1, with_overlap=False)
    m = out["matches"]
    assert m.shape[1] >= 100, f"too few matches: {m.shape}"
    d = out["kpts1"][m[1]] - out["kpts0"][m[0]]
    # true shift is (+8, 0); the median match must recover it.
    assert abs(float(np.median(d[:, 0])) - 8.0) < 1.5
    assert abs(float(np.median(d[:, 1]))) < 1.5


@pytest.mark.slow
def test_shipped_superglue_pipeline_builds():
    if not _have(".ckpt_matching_r5/superpoint",
                 ".ckpt_matching_r5/superglue"):
        pytest.skip("no shipped matching checkpoint")
    from oetr_tpu.pipelines import PipelineConfig, build_shipped_model

    cfg = PipelineConfig(canvas_hw=(256, 256), oetr_hw=(256, 256))
    pipeline, conf = build_shipped_model("superglue", cfg=cfg)
    assert conf["matcher"] == "superglue"
    assert pipeline.match_fn is not None
