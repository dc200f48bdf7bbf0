"""Ring attention on the 8-device CPU mesh vs single-device full attention."""
import jax
import jax.numpy as jnp
import numpy as np
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
