"""Pair-parallel sharded inference (SURVEY.md §2.7).

The reference evaluates pairs serially at batch=1 (evaluation.py:303).
The TPU pipeline is a batched jit program, so sharding the batch along a
'data' mesh axis distributes pairs across chips with zero pipeline-code
changes — jit propagates the input sharding. This test proves the sharded
run matches the single-device run bit-for-layout on the 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.models import SuperPoint, nearest_neighbor_match
from oetr_tpu.parallel import make_mesh, shard_batch
from oetr_tpu.pipelines import PipelineConfig, SparsePipeline


def _textured(rng, h=64, w=64):
    import cv2
    img = rng.uniform(0, 1, (h // 8, w // 8, 3)).astype(np.float32)
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)


@pytest.fixture(scope="module")
def pipeline():
    cfg = PipelineConfig(oetr_hw=(64, 64), canvas_hw=(64, 64),
                         fallback_min_matches=0)
    sp = SuperPoint(max_keypoints=64, keypoint_threshold=1e-5, nms_radius=2)
    sp_params = sp.init(jax.random.key(0), jnp.zeros((1, 64, 64, 1)))
    match_fn = lambda data: nearest_neighbor_match(
        data["descriptors0"], data["descriptors1"],
        data["valid0"], data["valid1"], do_mutual_check=True)
    return SparsePipeline(sp, sp_params, match_fn, cfg=cfg)


def test_sharded_pairs_match_unsharded(pipeline):
    rng = np.random.default_rng(3)
    b = 8
    imgs0 = jnp.asarray(np.stack([_textured(rng) for _ in range(b)]))
    imgs1 = jnp.asarray(np.stack([_textured(rng) for _ in range(b)]))
    hw = jnp.tile(jnp.array([[64, 64]]), (b, 1))

    ref = pipeline(imgs0, imgs1, hw, hw, with_overlap=False)

    mesh = make_mesh({"data": 8})
    batch = shard_batch({"i0": imgs0, "i1": imgs1, "h0": hw, "h1": hw}, mesh)
    sharded = pipeline(batch["i0"], batch["i1"], batch["h0"], batch["h1"],
                       with_overlap=False)
    # Output really is distributed across the 8 devices.
    assert len(sharded["keypoints0"].sharding.device_set) == 8

    np.testing.assert_array_equal(np.asarray(ref["matches0"]),
                                  np.asarray(sharded["matches0"]))
    np.testing.assert_allclose(np.asarray(ref["keypoints0"]),
                               np.asarray(sharded["keypoints0"]),
                               atol=1e-5)
