"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule equivalence.

Validates on the virtual 8-device CPU mesh (SURVEY.md §4) that the
pipelined OETR encoder matches the sequential QueryTransformer encoder
bit-for-bit in f32, forward and backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oetr_tpu.parallel import make_mesh
from oetr_tpu.parallel.pipeline import gpipe, pipelined_encoder

pytestmark = pytest.mark.quick


def test_gpipe_matches_sequential_simple_stages():
    # Stages: y = tanh(x @ W_i); 4 stages, 8 microbatches.
    S, M, mb, d = 4, 8, 2, 16
    rng = np.random.RandomState(0)
    ws = jnp.asarray(rng.randn(S, d, d) * 0.3, jnp.float32)
    xs = jnp.asarray(rng.randn(M, mb, d), jnp.float32)

    mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])
    out = gpipe(lambda p, x: jnp.tanh(x @ p["w"]), {"w": ws}, xs, mesh)

    ref = xs
    for i in range(S):
        ref = jnp.tanh(ref @ ws[i])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_differentiable():
    S, M, mb, d = 4, 4, 2, 8
    rng = np.random.RandomState(1)
    ws = jnp.asarray(rng.randn(S, d, d) * 0.3, jnp.float32)
    xs = jnp.asarray(rng.randn(M, mb, d), jnp.float32)
    mesh = make_mesh({"pipe": S}, devices=jax.devices()[:S])

    def loss_pipe(w):
        out = gpipe(lambda p, x: jnp.tanh(x @ p["w"]), {"w": w}, xs, mesh)
        return jnp.sum(out ** 2)

    def loss_seq(w):
        ref = xs
        for i in range(S):
            ref = jnp.tanh(ref @ w[i])
        return jnp.sum(ref ** 2)

    g_pipe = jax.grad(loss_pipe)(ws)
    g_seq = jax.grad(loss_seq)(ws)
    np.testing.assert_allclose(np.asarray(g_pipe), np.asarray(g_seq),
                               rtol=1e-5, atol=1e-6)


def _toy_transformer(num_layers=4, d=32, nhead=4, n=25, b=4, attention="linear"):
    from oetr_tpu.models.transformer import QueryTransformer

    tr = QueryTransformer(d_model=d, nhead=nhead, num_layers=num_layers,
                          num_decoder_layers=1, attention=attention)
    rng = np.random.RandomState(2)
    f0 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
    f1 = jnp.asarray(rng.randn(b, n, d), jnp.float32)
    pos = jnp.asarray(rng.randn(1, n, d) * 0.1, jnp.float32)
    q0 = jnp.zeros((1, d), jnp.float32)
    mask0 = jnp.asarray(rng.rand(b, n) > 0.2)
    mask1 = jnp.asarray(rng.rand(b, n) > 0.2)
    params = tr.init(jax.random.key(0), f0, f1, q0, q0, pos, pos,
                     mask0, mask1)["params"]
    return tr, params, f0, f1, pos, mask0, mask1


@pytest.mark.parametrize("attention", ["linear", "full"])
def test_pipelined_encoder_matches_sequential(attention):
    num_layers, d, nhead = 4, 32, 4
    tr, params, f0, f1, pos, mask0, mask1 = _toy_transformer(
        num_layers=num_layers, d=d, nhead=nhead, attention=attention)
    q0 = jnp.zeros((1, d), jnp.float32)
    _, _, mem0, mem1 = tr.apply({"params": params}, f0, f1, q0, q0,
                                pos, pos, mask0, mask1)

    mesh = make_mesh({"pipe": num_layers},
                     devices=jax.devices()[:num_layers])
    p0, p1 = pipelined_encoder(params, f0, f1, pos, pos, mesh,
                               mask0=mask0, mask1=mask1,
                               num_layers=num_layers, nhead=nhead,
                               attention=attention)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(mem0),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(mem1),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_encoder_grads_match():
    num_layers, d, nhead = 4, 16, 4
    tr, params, f0, f1, pos, mask0, mask1 = _toy_transformer(
        num_layers=num_layers, d=d, nhead=nhead, n=9, b=4)
    q0 = jnp.zeros((1, d), jnp.float32)
    mesh = make_mesh({"pipe": num_layers},
                     devices=jax.devices()[:num_layers])

    def loss_seq(p):
        _, _, m0, m1 = tr.apply({"params": p}, f0, f1, q0, q0,
                                pos, pos, mask0, mask1)
        return jnp.sum(m0 ** 2) + jnp.sum(m1 ** 2)

    def loss_pipe(p):
        a, b_ = pipelined_encoder(p, f0, f1, pos, pos, mesh,
                                  mask0=mask0, mask1=mask1,
                                  num_layers=num_layers, nhead=nhead)
        return jnp.sum(a ** 2) + jnp.sum(b_ ** 2)

    g_seq = jax.grad(loss_seq)(params)
    g_pipe = jax.grad(loss_pipe)(params)
    for i in range(num_layers):
        for k in (f"enc_self_{i}", f"enc_cross_{i}"):
            a = jax.tree.leaves(g_seq[k])
            b = jax.tree.leaves(g_pipe[k])
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                           rtol=1e-4, atol=1e-3)
