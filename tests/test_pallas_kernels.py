"""Pallas kernels vs jnp reference ops (interpret mode on CPU)."""
import jax
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


def test_flash_attention_matches_reference(rng):
    """Streaming KV-blocked kernel == whole-row softmax oracle, including
    ragged (non-block-divisible) L/S handled by internal padding."""
    from oetr_tpu.ops.pallas_attention import flash_attention_pallas
    q, k, v = _qkv(rng, b=2, l=75, s=130, h=2, d=16)
    qm = jnp.asarray(np.arange(75) < 60)[None].repeat(2, 0)
    km = jnp.asarray(np.arange(130) < 100)[None].repeat(2, 0)
    ref = full_attention(q, k, v, qm, km)
    out = flash_attention_pallas(q, k, v, qm, km, block_q=32, block_k=64,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:, :60],
                               np.asarray(ref)[:, :60], atol=2e-5)


def test_flash_attention_unmasked(rng):
    from oetr_tpu.ops.pallas_attention import flash_attention_pallas
    q, k, v = _qkv(rng, b=1, l=64, s=128, h=2, d=16)
    ref = full_attention(q, k, v)
    out = flash_attention_pallas(q, k, v, block_q=32, block_k=32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_transformer_flash_dispatch(rng, monkeypatch):
    """attention='full:flash' through the model dispatch == 'full'
    (OETR_PALLAS_INTERPRET forces the real kernel, interpreted, on CPU —
    without it the dispatch falls back to the XLA op off-TPU)."""
    import jax

    monkeypatch.setenv("OETR_PALLAS_INTERPRET", "1")
    from oetr_tpu.models.transformer import _attend
    q, k, v = _qkv(rng, b=2, l=40, s=40, h=2, d=16)
    ref = _attend("full", q, k, v, None, None)
    out = jax.jit(lambda *a: _attend("full:flash", *a, None, None))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_dispatch_cpu_fallback(rng, monkeypatch):
    """Off-TPU without the env override, ':pallas' kinds use the XLA ops
    (exact equality), so the flagship config stays fast in CPU tests."""
    monkeypatch.delenv("OETR_PALLAS_INTERPRET", raising=False)
    from oetr_tpu.models.transformer import _attend
    q, k, v = _qkv(rng, b=1, l=32, s=32, h=2, d=16)
    ref = _attend("linear", q, k, v, None, None)
    out = _attend("linear:pallas", q, k, v, None, None)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sinkhorn_pallas_matches_xla(rng):
    """VMEM-resident Sinkhorn kernel == the XLA scan, incl. dustbins and
    validity masks (SuperGlue's matching core)."""
    from oetr_tpu.ops.sinkhorn import log_optimal_transport

    b, m, n = 2, 48, 64
    scores = jnp.asarray(rng.normal(0, 1, (b, m, n)).astype(np.float32))
    mask0 = jnp.asarray(np.arange(m) < 40)[None].repeat(b, 0)
    mask1 = jnp.asarray(np.arange(n) < 50)[None].repeat(b, 0)
    ref = log_optimal_transport(scores, 0.7, 20, mask0, mask1)
    out = log_optimal_transport(scores, 0.7, 20, mask0, mask1,
                                use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pallas_attention_grads_match_xla(rng):
    """custom_vjp: Pallas forwards are differentiable, with gradients
    equal to the XLA ops' (the backward IS the XLA VJP) — training with
    the fused kernels works (the round-2 train demo caught this)."""
    import jax

    from oetr_tpu.ops.pallas_attention import (flash_attention_pallas,
                                               linear_attention_pallas)
    q, k, v = _qkv(rng, b=1, l=32, s=32, h=2, d=16)
    qm = jnp.asarray(np.arange(32) < 28)[None]
    km = jnp.asarray(np.arange(32) < 30)[None]

    for pl_fn, xla_fn in [
            (lambda *a: linear_attention_pallas(*a, interpret=True),
             linear_attention),
            (lambda *a: flash_attention_pallas(
                *a, block_q=16, block_k=16, interpret=True),
             full_attention)]:
        g_pl = jax.grad(lambda q_: jnp.sum(pl_fn(q_, k, v, qm, km) ** 2))(q)
        g_x = jax.grad(lambda q_: jnp.sum(xla_fn(q_, k, v, qm, km) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_x),
                                   atol=5e-4)


def test_fused_encoder_sublayer_parity(rng):
    """linear:pallas EncoderLayer (whole-sublayer fused kernel, round 4)
    must share the param tree with the plain path and agree numerically
    (same params, same inputs) in interpret mode."""
    import os

    from oetr_tpu.models.transformer import EncoderLayer

    b, n, s, c = 2, 16, 24, 32
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(b, s, c)).astype(np.float32))
    xp = jnp.asarray(rng.normal(size=(1, n, c)).astype(np.float32)) * 0.1
    sp = jnp.asarray(rng.normal(size=(1, s, c)).astype(np.float32)) * 0.1
    xm = jnp.asarray(rng.random((b, n)) > 0.2)
    sm = jnp.asarray(rng.random((b, s)) > 0.2)

    plain = EncoderLayer(d_model=c, nhead=4, attention="linear")
    fused = EncoderLayer(d_model=c, nhead=4, attention="linear:pallas")
    params = plain.init(jax.random.key(0), x, src, xm, sm, xp, sp)
    y0 = plain.apply(params, x, src, xm, sm, xp, sp)

    os.environ["OETR_PALLAS_INTERPRET"] = "1"
    try:
        p1 = fused.init(jax.random.key(0), x, src, xm, sm, xp, sp)
        assert jax.tree.structure(p1) == jax.tree.structure(params)
        # identical fresh inits (param RNG derives from scope path)
        for a, b_ in zip(jax.tree.leaves(params), jax.tree.leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_))
        y1 = fused.apply(params, x, src, xm, sm, xp, sp)
    finally:
        del os.environ["OETR_PALLAS_INTERPRET"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)
