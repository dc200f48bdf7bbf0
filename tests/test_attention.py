"""Attention ops: linear-vs-full agreement, mask correctness
(oracles for the Pallas kernels; ref semantics linear_attention.py:16-87)."""
import jax
import jax.numpy as jnp
import numpy as np

from oetr_tpu.ops import full_attention, linear_attention


def _qkv(rng, b=2, l=16, s=24, h=4, d=8, scale=0.1):
    q = jnp.asarray(rng.normal(0, scale, (b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(0, scale, (b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1.0, (b, s, h, d)), jnp.float32)
    return q, k, v


def test_full_attention_is_softmax(rng):
    q, k, v = _qkv(rng)
    out = full_attention(q, k, v)
    # Direct numpy computation.
    qn, kn, vn = np.asarray(q), np.asarray(k), np.asarray(v)
    qk = np.einsum("nlhd,nshd->nlsh", qn, kn) / np.sqrt(qn.shape[-1])
    a = np.exp(qk - qk.max(axis=2, keepdims=True))
    a = a / a.sum(axis=2, keepdims=True)
    ref = np.einsum("nlsh,nshd->nlhd", a, vn)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_linear_attention_normalization(rng):
    # With near-constant features, attention ~ average of values.
    q, k, v = _qkv(rng, scale=1e-4)
    out = linear_attention(q, k, v)
    ref = np.asarray(v).mean(axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(ref, out.shape), atol=1e-3)


def test_masks_ignore_padding(rng):
    q, k, v = _qkv(rng, s=24)
    kv_mask = jnp.asarray(np.arange(24) < 16)[None].repeat(2, 0)
    for fn in (linear_attention, full_attention):
        out_masked = fn(q, k, v, None, kv_mask)
        out_trunc = fn(q, k[:, :16], v[:, :16])
        np.testing.assert_allclose(np.asarray(out_masked),
                                   np.asarray(out_trunc), atol=1e-5,
                                   err_msg=fn.__name__)


def test_q_mask_zeroes_only_linear_query_features(rng):
    # Padded queries produce junk rows that downstream masking discards;
    # ensure they are at least finite.
    q, k, v = _qkv(rng)
    q_mask = jnp.asarray(np.arange(16) < 10)[None].repeat(2, 0)
    kv_mask = jnp.ones((2, 24), bool)
    for fn in (linear_attention, full_attention):
        out = fn(q, k, v, q_mask, kv_mask)
        assert np.all(np.isfinite(np.asarray(out))), fn.__name__


def test_linear_matches_full_on_peaked_distribution(rng):
    """Sanity: both mechanisms attend to the same dominant key when one key
    matches the query far better than the rest."""
    b, l, s, h, d = 1, 4, 32, 1, 8
    k = jnp.asarray(rng.normal(0, 0.05, (b, s, h, d)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 0.05, (b, l, h, d)), jnp.float32)
    # Key 7 strongly aligned with all queries.
    q = q.at[:, :, 0].add(2.0)
    k = k.at[:, 7, 0].add(2.0)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.float32)
    of = np.asarray(full_attention(q, k, v))
    ol = np.asarray(linear_attention(q, k, v))
    target = np.asarray(v[:, 7])
    # Full attention nearly selects v[7]; linear attention moves toward it.
    err_f = np.linalg.norm(of - target[:, None], axis=-1).mean()
    base = np.linalg.norm(np.asarray(v).mean(1) - target, axis=-1).mean()
    err_l = np.linalg.norm(ol - target[:, None], axis=-1).mean()
    assert err_f < 0.5 * base
    assert err_l < base


def test_jit_and_grad(rng):
    q, k, v = _qkv(rng)

    def loss(q):
        return jnp.sum(linear_attention(q, k, v) ** 2)

    g = jax.jit(jax.grad(loss))(q)
    assert np.all(np.isfinite(np.asarray(g)))
