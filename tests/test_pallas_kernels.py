"""Pallas kernels vs jnp reference ops (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from oetr_tpu.ops import full_attention, linear_attention
from oetr_tpu.ops.pallas_attention import (full_attention_pallas,
                                           linear_attention_pallas)


def _qkv(rng, b=2, l=64, s=96, h=2, d=16):
    q = jnp.asarray(rng.normal(0, 0.3, (b, l, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.3, (b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1.0, (b, s, h, d)).astype(np.float32))
    return q, k, v


def test_linear_attention_matches_reference(rng):
    q, k, v = _qkv(rng)
    ref = linear_attention(q, k, v)
    out = linear_attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_linear_attention_masked(rng):
    q, k, v = _qkv(rng)
    qm = jnp.asarray(np.arange(64) < 50)[None].repeat(2, 0)
    km = jnp.asarray(np.arange(96) < 70)[None].repeat(2, 0)
    ref = linear_attention(q, k, v, qm, km)
    out = linear_attention_pallas(q, k, v, qm, km, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_full_attention_matches_reference(rng):
    q, k, v = _qkv(rng)
    ref = full_attention(q, k, v)
    out = full_attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_full_attention_masked(rng):
    q, k, v = _qkv(rng)
    qm = jnp.asarray(np.arange(64) < 40)[None].repeat(2, 0)
    km = jnp.asarray(np.arange(96) < 60)[None].repeat(2, 0)
    ref = full_attention(q, k, v, qm, km)
    out = full_attention_pallas(q, k, v, qm, km, interpret=True)
    # Compare only valid query rows (masked rows are junk in both).
    r = np.asarray(ref)[:, :40]
    o = np.asarray(out)[:, :40]
    np.testing.assert_allclose(o, r, atol=2e-5)


def test_bfloat16_io(rng):
    q, k, v = _qkv(rng)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = linear_attention_pallas(qb, kb, vb, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = linear_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)
