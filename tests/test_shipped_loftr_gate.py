"""Artifact-level LoFTR quality floor (round 5).

Loads the SHIPPED dense-matcher checkpoint (.ckpt_loftr_r5 — the
coarse+fine run behind the BASELINE.md §7 parity row) and pins two
properties on held-out on-device scene pairs with known geometry:

1. it matches (>= 100 matches/pair on average at 256²);
2. the fine refinement is live and sub-cell-accurate: the median
   endpoint error of its matches against the continuous depth+pose
   warp must beat the 8px coarse-cell quantization floor by a wide
   margin (the unsupervised-fine run shipped earlier in round 5
   measured ~4px median; the fine-trained one ~1px).

Skips cleanly when no checkpoint is on disk (fresh clone pre-training).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CKPT = os.path.join(ROOT, ".ckpt_loftr_r5", "loftr")


@pytest.mark.slow
def test_shipped_loftr_matches_and_refines():
    if not os.path.exists(CKPT):
        pytest.skip("no shipped LoFTR checkpoint on disk")
    import orbax.checkpoint as ocp

    from oetr_tpu.data.device_synth import make_device_generator
    from oetr_tpu.models.loftr import LoFTR
    from oetr_tpu.training.loftr import warp_cell_centers_batch

    hw = 256
    model = LoFTR(d_coarse=192, d_fine=96, coarse_layers=4,
                  max_matches=1024)
    tmpl = jax.jit(model.init)(jax.random.key(0),
                               jnp.zeros((1, hw, hw, 1)),
                               jnp.zeros((1, hw, hw, 1)))
    params = ocp.StandardCheckpointer().restore(CKPT, tmpl)

    b = 4
    gen = make_device_generator(hw, b, scale_range=(1.0, 2.0),
                                p_translate=0.5)
    raw = gen(jax.random.key(991))    # disjoint from training key 17
    lum = jnp.asarray([0.299, 0.587, 0.114])
    g0 = (raw["image1"] @ lum)[..., None]
    g1 = (raw["image2"] @ lum)[..., None]
    out = jax.jit(model.apply)(params, g0, g1)

    T = jax.vmap(lambda p2, p1: p2 @ jnp.linalg.inv(p1))(
        raw["pose2"], raw["pose1"])
    gt_xy1, gt_ok = warp_cell_centers_batch(
        out["mkpts0"], raw["depth1"], raw["K1"], T, raw["K2"],
        depth1=raw["depth2"])

    valid = np.asarray(out["valid"]) & np.asarray(gt_ok)
    assert valid.sum() >= 100 * b, f"too few matches: {valid.sum()}"

    err = np.linalg.norm(np.asarray(out["mkpts1"]) - np.asarray(gt_xy1),
                         axis=-1)[valid]
    med = float(np.median(err))
    # Coarse cells are 8px; an untrained fine stage leaves ~half-cell
    # error. The fine-trained artifact must be well inside one cell.
    assert med < 2.5, f"fine refinement not load-bearing: median {med:.2f}px"
