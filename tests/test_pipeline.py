"""End-to-end overlap-guided pipeline on synthetic shifted image pairs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.config import BackboneConfig, NeckConfig, OETRConfig
from oetr_tpu.data.images import batch_pairs, prepare_image
from oetr_tpu.data.pairs import parse_eval_pairs_line, parse_pairs_line
from oetr_tpu.models import SuperPoint, build_oetr, nearest_neighbor_match
from oetr_tpu.pipelines import PipelineConfig, SparsePipeline, gate_boxes


def _textured_image(rng, h=96, w=96):
    img = rng.uniform(0, 1, (h // 8, w // 8, 3)).astype(np.float32)
    import cv2
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)


@pytest.fixture(scope="module")
def pipeline():
    cfg = PipelineConfig(oetr_hw=(64, 64), canvas_hw=(96, 96),
                         fallback_min_matches=0)
    sp = SuperPoint(max_keypoints=128, keypoint_threshold=1e-5, nms_radius=2)
    sp_params = sp.init(jax.random.key(0), jnp.zeros((1, 96, 96, 1)))
    match_fn = lambda data: nearest_neighbor_match(
        data["descriptors0"], data["descriptors1"],
        data["valid0"], data["valid1"], do_mutual_check=True)
    return SparsePipeline(sp, sp_params, match_fn, cfg=cfg)


def test_plain_pipeline_identity_pair(pipeline, rng):
    img = _textured_image(rng)
    p = prepare_image(img, (96, 96), (64, 64))
    batch = batch_pairs([p], [p])
    out = pipeline(jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
                   jnp.asarray(batch["full_hw0"]),
                   jnp.asarray(batch["full_hw1"]), with_overlap=False)
    m = np.asarray(out["matches0"][0])
    v = np.asarray(out["valid0"][0])
    k0 = np.asarray(out["keypoints0"][0])
    k1 = np.asarray(out["keypoints1"][0])
    sel = (m > -1) & v
    assert sel.sum() >= 10
    err = np.linalg.norm(k0[sel] - k1[m[sel]], axis=-1)
    # Identity pair: matched keypoints coincide.
    assert np.median(err) < 1.0


@pytest.mark.slow
def test_overlap_pipeline_with_oetr(pipeline, rng):
    cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(4, 4)))
    oetr = build_oetr(cfg)
    od = jnp.zeros((1, 64, 64, 3))
    oetr_params = oetr.init(jax.random.key(1), od, od)
    pipeline.oetr = oetr
    pipeline.oetr_params = oetr_params
    try:
        img = _textured_image(rng)
        p = prepare_image(img, (96, 96), (64, 64))
        batch = batch_pairs([p], [p])
        out = pipeline(
            jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
            jnp.asarray(batch["full_hw0"]), jnp.asarray(batch["full_hw1"]),
            jnp.asarray(batch["oetr_img0"]), jnp.asarray(batch["oetr_img1"]),
            jnp.asarray(batch["scales0"]), jnp.asarray(batch["scales1"]),
            with_overlap=True)
        # Boxes exist and lie within the image frame.
        b0 = np.asarray(out["bbox0"][0])
        assert b0[0] >= 0 and b0[2] <= 96 + 1e-3
        # Keypoints are reported in the full-res frame.
        k0 = np.asarray(out["keypoints0"][0])
        assert k0.min() >= -1e-3 and k0.max() <= 96 + 1e-3
    finally:
        pipeline.oetr = None
        pipeline.oetr_params = None


def test_gate_boxes_fallback():
    bbox0 = jnp.asarray([[10.0, 10.0, 10.5, 60.0]])   # degenerate width
    bbox1 = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])
    hw = jnp.asarray([[100, 120]])
    g0, g1, ok = gate_boxes(bbox0, bbox1, hw, hw, PipelineConfig())
    assert not bool(ok[0])
    np.testing.assert_allclose(np.asarray(g0[0]), [0, 0, 120, 100])
    np.testing.assert_allclose(np.asarray(g1[0]), [0, 0, 120, 100])


def test_pairs_parsers():
    K = ",".join(["1"] * 9)
    P = ",".join(["1"] * 16)
    line = (f"a.jpg a.h5 {K} {P} 0,0,10,10 b.jpg b.h5 {K} {P} 1,1,5,5")
    rec = parse_pairs_line(line)
    assert rec is not None and rec.image_path1 == "a.jpg"
    assert rec.K1.shape == (3, 3) and rec.pose2.shape == (4, 4)
    # Degenerate overlap box -> filtered (megadepth_pairs.py:83-85).
    bad = line.replace("0,0,10,10", "5,5,5,10")
    assert parse_pairs_line(bad) is None

    ev = "x/s/im0.jpg x/s/im1.jpg " + " ".join(["2"] * 9 + ["3"] * 9) + " " \
        + " ".join(["4"] * 16) + " 0 0 5 5 1 1 6 6"
    p = parse_eval_pairs_line(ev)
    assert p is not None
    assert p.K0[0, 0] == 2 and p.K1[0, 0] == 3 and p.T_0to1[0, 0] == 4
    np.testing.assert_allclose(p.bbox0, [0, 0, 5, 5])


@pytest.mark.slow
def test_fallback_rule2_retries_full_image(pipeline, rng):
    """Fallback rule 2 (ref: overlap_features.py:215-244): when the
    overlap-guided pass yields fewer matches than the threshold, the
    failing pairs are re-run full-image and must reproduce the plain
    path exactly (used_overlap cleared)."""
    cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(4, 4)))
    oetr = build_oetr(cfg)
    od = jnp.zeros((1, 64, 64, 3))
    oetr_params = oetr.init(jax.random.key(2), od, od)
    pipeline.oetr = oetr
    pipeline.oetr_params = oetr_params
    old_cfg = pipeline.cfg
    try:
        # Impossible threshold -> retry always fires (frozen dataclass:
        # swap the whole config).
        import dataclasses
        pipeline.cfg = dataclasses.replace(old_cfg,
                                           fallback_min_matches=10 ** 6)
        img = _textured_image(rng)
        p = prepare_image(img, (96, 96), (64, 64))
        batch = batch_pairs([p], [p])
        args = (jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
                jnp.asarray(batch["full_hw0"]), jnp.asarray(batch["full_hw1"]))
        guided = pipeline(*args,
                          jnp.asarray(batch["oetr_img0"]),
                          jnp.asarray(batch["oetr_img1"]),
                          jnp.asarray(batch["scales0"]),
                          jnp.asarray(batch["scales1"]), with_overlap=True)
        plain = pipeline(*args, with_overlap=False)
        assert not bool(np.asarray(guided["used_overlap"]).any())
        np.testing.assert_allclose(np.asarray(guided["keypoints0"]),
                                   np.asarray(plain["keypoints0"]),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(guided["matches0"]),
                                      np.asarray(plain["matches0"]))
    finally:
        pipeline.cfg = old_cfg
        pipeline.oetr = None
        pipeline.oetr_params = None


@pytest.mark.slow
def test_dense_fallback_rule2_retries_full_image(rng):
    """Same retry contract for the dense (LoFTR) pipeline — the
    reference applies rule 2 to every matcher (overlap_features.py:215)."""
    from oetr_tpu.models import LoFTR
    from oetr_tpu.pipelines import DensePipeline

    loftr = LoFTR(d_coarse=32, d_fine=16, coarse_layers=1, fine_layers=1,
                  nhead=4, max_matches=64)
    lp = loftr.init(jax.random.key(3), jnp.zeros((1, 96, 96, 1)),
                    jnp.zeros((1, 96, 96, 1)))
    cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(4, 4)))
    oetr = build_oetr(cfg)
    od = jnp.zeros((1, 64, 64, 3))
    op = oetr.init(jax.random.key(4), od, od)
    pcfg = PipelineConfig(oetr_hw=(64, 64), canvas_hw=(96, 96),
                          fallback_min_matches=10 ** 6)
    pipe = DensePipeline(loftr, lp, oetr, op, cfg=pcfg)

    img = _textured_image(rng)
    p = prepare_image(img, (96, 96), (64, 64))
    batch = batch_pairs([p], [p])
    args = (jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
            jnp.asarray(batch["full_hw0"]), jnp.asarray(batch["full_hw1"]))
    guided = pipe(*args,
                  jnp.asarray(batch["oetr_img0"]),
                  jnp.asarray(batch["oetr_img1"]),
                  jnp.asarray(batch["scales0"]),
                  jnp.asarray(batch["scales1"]), with_overlap=True)
    plain = pipe(*args, with_overlap=False)
    assert not bool(np.asarray(guided["used_overlap"]).any())
    np.testing.assert_allclose(np.asarray(guided["mkpts0"]),
                               np.asarray(plain["mkpts0"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(guided["valid"]),
                                  np.asarray(plain["valid"]))


@pytest.mark.slow
def test_bucketed_retry_partial_batch(pipeline, rng):
    """Round-5 bucketed retry (_bucketed_retry): with a batch where only
    SOME pairs fail the match-count gate, the failing pairs must equal
    the plain full-image result while passing pairs keep their guided
    output untouched — and the retry runs at the fixed bucket shape."""
    import dataclasses

    cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(4, 4)))
    oetr = build_oetr(cfg)
    od = jnp.zeros((1, 64, 64, 3))
    oetr_params = oetr.init(jax.random.key(5), od, od)
    pipeline.oetr = oetr
    pipeline.oetr_params = oetr_params
    old_cfg = pipeline.cfg
    try:
        imgs = [_textured_image(rng) for _ in range(4)]
        ps = [prepare_image(im, (96, 96), (64, 64)) for im in imgs]
        # Pairs 0/1: identity (many matches). Pair 2: two UNRELATED
        # textures (few matches) — guarantees a count split so the
        # partial-retry path is exercised.
        batch = batch_pairs([ps[0], ps[1], ps[2]], [ps[0], ps[1], ps[3]])
        args = (jnp.asarray(batch["image0"]), jnp.asarray(batch["image1"]),
                jnp.asarray(batch["full_hw0"]),
                jnp.asarray(batch["full_hw1"]))
        oargs = (jnp.asarray(batch["oetr_img0"]),
                 jnp.asarray(batch["oetr_img1"]),
                 jnp.asarray(batch["scales0"]),
                 jnp.asarray(batch["scales1"]))

        # Pass 1: no retry — the guided baseline and per-pair counts.
        pipeline.cfg = dataclasses.replace(old_cfg, fallback_min_matches=0,
                                           retry_batch=2)
        base = pipeline(*args, *oargs, with_overlap=True)
        counts = np.asarray(base["num_matches"])
        used = np.asarray(base["used_overlap"])
        assert used.all(), "test premise: all pairs took the overlap path"
        # Threshold chosen so at least one pair fails and one passes.
        thr = int(np.sort(counts)[len(counts) // 2])
        fails = counts < thr
        if not (fails.any() and (~fails).any()):
            thr = int(counts.min()) + 1
            fails = counts < thr
        assert fails.any() and (~fails).any(), f"counts all equal: {counts}"

        pipeline.cfg = dataclasses.replace(old_cfg,
                                           fallback_min_matches=thr,
                                           retry_batch=2)
        out = pipeline(*args, *oargs, with_overlap=True)
        plain = pipeline(*args, with_overlap=False)

        for i in range(3):
            if fails[i]:
                np.testing.assert_allclose(
                    np.asarray(out["keypoints0"][i]),
                    np.asarray(plain["keypoints0"][i]), atol=1e-5)
                np.testing.assert_array_equal(
                    np.asarray(out["matches0"][i]),
                    np.asarray(plain["matches0"][i]))
                assert not bool(np.asarray(out["used_overlap"])[i])
            else:
                np.testing.assert_array_equal(
                    np.asarray(out["matches0"][i]),
                    np.asarray(base["matches0"][i]))
                assert bool(np.asarray(out["used_overlap"])[i])
    finally:
        pipeline.cfg = old_cfg
        pipeline.oetr = None
        pipeline.oetr_params = None
