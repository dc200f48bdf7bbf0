"""Cross-checks against literal transcriptions of the reference's
pipeline arithmetic — the "easy to get subtly wrong, AUC silently
degrades" chain SURVEY.md §7 warns about.

Each oracle below is a line-by-line transcription (in torch/numpy) of
the cited reference fragment, evaluated on random boxes/keypoints and
compared with our implementations.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.quick
def test_overlap_scale_score_matches_reference_floor_divide(rng):
    """Ref: evaluation.py:85-98 — .int()-truncated box sides, then
    torch.floor_divide ratios, max over the four combinations."""
    import jax.numpy as jnp

    from oetr_tpu.pipelines.matching import overlap_scale_score

    # Realistic boxes: positive coords, sides in [2, 600].
    x0 = rng.uniform(0, 200, (256, 2)).astype(np.float32)
    sides0 = rng.uniform(2, 600, (256, 2)).astype(np.float32)
    x1 = rng.uniform(0, 200, (256, 2)).astype(np.float32)
    sides1 = rng.uniform(2, 600, (256, 2)).astype(np.float32)
    bbox0 = np.concatenate([x0, x0 + sides0], axis=-1)
    bbox1 = np.concatenate([x1, x1 + sides1], axis=-1)

    ours = np.asarray(overlap_scale_score(jnp.asarray(bbox0),
                                          jnp.asarray(bbox1)))

    tb0 = torch.from_numpy(bbox0)
    tb1 = torch.from_numpy(bbox1)
    for i in range(len(bbox0)):
        bw0 = tb0[i][2].int() - tb0[i][0].int()
        bh0 = tb0[i][3].int() - tb0[i][1].int()
        bw1 = tb1[i][2].int() - tb1[i][0].int()
        bh1 = tb1[i][3].int() - tb1[i][1].int()
        ref = max(torch.floor_divide(bw0, bw1), torch.floor_divide(bh0, bh1),
                  torch.floor_divide(bw1, bw0), torch.floor_divide(bh1, bh0))
        assert int(ours[i]) == int(ref), (i, bbox0[i], bbox1[i])


@pytest.mark.quick
def test_unwarp_chain_matches_reference(rng):
    """Ref: overlap_features.py:123-127 —
    kpts_orig = (kpts / ratio + bbox[:2]) * scales."""
    import jax.numpy as jnp

    from oetr_tpu.ops.warp import unwarp_keypoints

    kpts = rng.uniform(0, 832, (4, 100, 2)).astype(np.float32)
    bbox = rng.uniform(0, 300, (4, 4)).astype(np.float32)
    ratio = rng.uniform(0.3, 3.0, (4,)).astype(np.float32)
    scales = rng.uniform(0.5, 2.0, (4, 2)).astype(np.float32)

    ours = np.asarray(unwarp_keypoints(jnp.asarray(kpts), jnp.asarray(bbox),
                                       jnp.asarray(ratio))) * scales[:, None]

    for i in range(4):
        ref = (kpts[i] / ratio[i] + bbox[i][:2]) * scales[i]
        np.testing.assert_allclose(ours[i], ref, rtol=1e-5)


@pytest.mark.quick
def test_inparams_intrinsics_correction_matches_reference(rng):
    """Ref: dloc/evaluate/utils/evaluation.py:305-323 — K is re-derived
    through K_nto = [[sx/rx, 0, sx*tx], [0, sy/ry, sy*ty], [0,0,1]] and
    K_new = inv(inv(K) @ K_nto)."""
    from oetr_tpu.evalx.twoview import correct_intrinsics

    for _ in range(20):
        K = np.array([[rng.uniform(400, 1200), 0, rng.uniform(200, 500)],
                      [0, rng.uniform(400, 1200), rng.uniform(200, 500)],
                      [0, 0, 1.0]])
        sx, sy = rng.uniform(0.5, 2.0, 2)
        tx, ty = rng.uniform(0, 100, 2)
        rx, ry = rng.uniform(0.3, 3.0, 2)
        inparams = np.array([sx, sy, tx, ty, rx, ry])

        ours = correct_intrinsics(K, inparams)

        K_nto = np.array([[sx / rx, 0, sx * tx], [0, sy / ry, sy * ty],
                          [0, 0, 1]], dtype=np.float64)
        K_inv = np.linalg.inv(K) @ K_nto
        ref = np.linalg.inv(K_inv)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)
