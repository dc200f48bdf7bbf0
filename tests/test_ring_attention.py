"""Ring attention on the 8-device CPU mesh vs single-device full attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from oetr_tpu.ops import full_attention
from oetr_tpu.parallel.ring_attention import ring_attention


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("seq",))


def test_ring_matches_full(rng):
    b, l, s, h, d = 2, 32, 64, 4, 16          # s divisible by 8
    q = jnp.asarray(rng.normal(0, 0.5, (b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1.0, (b, s, h, d)).astype(np.float32))
    ref = full_attention(q, k, v)
    out = ring_attention(q, k, v, _mesh())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_masked(rng):
    b, l, s, h, d = 1, 16, 64, 2, 8
    q = jnp.asarray(rng.normal(0, 0.5, (b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1.0, (b, s, h, d)).astype(np.float32))
    # Mask a scattered pattern crossing shard boundaries.
    mask = np.ones((b, s), bool)
    mask[0, 5:20] = False
    mask[0, 50:] = False
    ref = full_attention(q, k, v, None, jnp.asarray(mask))
    out = ring_attention(q, k, v, _mesh(), kv_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_fully_masked_shard(rng):
    """A shard whose keys are ALL masked must not poison the softmax."""
    b, l, s, h, d = 1, 8, 64, 1, 8
    q = jnp.asarray(rng.normal(0, 0.5, (b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.5, (b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1.0, (b, s, h, d)).astype(np.float32))
    mask = np.ones((b, s), bool)
    mask[0, :8] = False                       # first shard entirely invalid
    ref = full_attention(q, k, v, None, jnp.asarray(mask))
    out = ring_attention(q, k, v, _mesh(), kv_mask=jnp.asarray(mask))
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_model_dispatch_full_ring(rng):
    """attention='full:ring' through models.transformer._attend inside
    parallel.ring_context == plain full attention (the wiring VERDICT r1
    flagged as dead code)."""
    from oetr_tpu.models.transformer import _attend
    from oetr_tpu.parallel import ring_context

    b, l, h, d = 2, 64, 2, 16
    q = jnp.asarray(rng.normal(0, 0.3, (b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.3, (b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1.0, (b, l, h, d)).astype(np.float32))
    km = jnp.asarray(np.arange(l) < 48)[None].repeat(b, 0)

    ref = _attend("full", q, k, v, None, km)
    with ring_context(_mesh(), "seq"):
        out = _attend("full:ring", q, k, v, None, km)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_model_dispatch_full_ring_requires_context(rng):
    import pytest

    from oetr_tpu.models.transformer import _attend
    q = jnp.zeros((1, 8, 2, 4))
    with pytest.raises(ValueError, match="ring_context"):
        _attend("full:ring", q, q, q, None, None)


@pytest.mark.slow
def test_oetr_forward_with_ring_attention(rng):
    """Full OETR forward with attention='full:ring' == 'full' oracle —
    the stride-16 long-sequence config is actually reachable end-to-end."""
    from oetr_tpu.config import BackboneConfig, NeckConfig, OETRConfig
    from oetr_tpu.models import build_oetr
    from oetr_tpu.parallel import ring_context

    def boxes(attn):
        cfg = OETRConfig(
            backbone=BackboneConfig(depth=18, stop_layer="layer3",
                                    last_layer=256),
            neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                            num_decoder_layers=1, attention=attn,
                            max_shape=(8, 8)))
        model = build_oetr(cfg)
        img1 = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
        img2 = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
        params = model.init(jax.random.key(0), img1, img2)
        out = model.apply(params, img1, img2, deterministic=True)
        return np.asarray(out["pred_bbox1"]), np.asarray(out["pred_bbox2"])

    rng2 = np.random.default_rng(0)
    rng = rng2
    b_full = boxes("full")
    rng = np.random.default_rng(0)
    with ring_context(_mesh(), "seq"):
        b_ring = boxes("full:ring")
    np.testing.assert_allclose(b_ring[0], b_full[0], atol=1e-3)
    np.testing.assert_allclose(b_ring[1], b_full[1], atol=1e-3)


def test_ulysses_matches_full(rng):
    """Ulysses head-sharding (all-to-all heads<->sequence) == full
    attention — the cheap SP alternative SURVEY §2.7 calls for."""
    from oetr_tpu.parallel import ulysses_attention

    b, l, h, d = 2, 64, 8, 16
    q = jnp.asarray(rng.normal(0, 0.3, (b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.3, (b, l, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1.0, (b, l, h, d)).astype(np.float32))
    km = jnp.asarray(np.arange(l) < 48)[None].repeat(b, 0)

    ref = full_attention(q, k, v, None, km)
    out = ulysses_attention(q, k, v, _mesh(), "seq", kv_mask=km)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
