"""Pallas TPU kernel: log-domain Sinkhorn iterations, VMEM-resident.

The SuperGlue matching core (SURVEY.md §2.8 "Pallas log-domain Sinkhorn
kernel"; reference iteration counts 20-30 from
/root/reference/dloc/core/match_features.py:29,41). The XLA scan in
ops/sinkhorn.py re-reads the [M, N] cost matrix from HBM on every
row/col normalization; here the matrix is loaded into VMEM once and all
``iters`` alternating normalizations run on-chip — zero HBM traffic
between iterations. For SuperGlue's M = N = 1024 + dustbin, the f32
matrix is ~4.2 MB, comfortably inside the ~16 MB VMEM budget.

Numerics match ops/sinkhorn.log_sinkhorn exactly: masked entries carry
the same finite NEG_INF = -1e9 sentinel, so max-shifted logsumexp
behaves identically to jax.nn.logsumexp on the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _sinkhorn_kernel(cost_ref, mu_ref, nu_ref, out_ref, *, iters: int):
    """One batch element: cost [1, M, N]; mu [1, M, 1]; nu [1, 1, N]."""
    c = cost_ref[0].astype(jnp.float32)            # [M, N]
    mu = mu_ref[0].astype(jnp.float32)             # [M, 1]
    nu = nu_ref[0].astype(jnp.float32)             # [1, N]

    def body(_, carry):
        u, v = carry                               # [M, 1], [1, N]
        t = c + v
        m = jnp.max(t, axis=1, keepdims=True)
        u = mu - (m + jnp.log(jnp.sum(jnp.exp(t - m), axis=1,
                                      keepdims=True)))
        t = c + u
        m2 = jnp.max(t, axis=0, keepdims=True)
        v = nu - (m2 + jnp.log(jnp.sum(jnp.exp(t - m2), axis=0,
                                       keepdims=True)))
        return u, v

    u0 = jnp.zeros((c.shape[0], 1), jnp.float32)
    v0 = jnp.zeros((1, c.shape[1]), jnp.float32)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    out_ref[0] = (c + u + v).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def log_sinkhorn_pallas(log_cost: Array, log_mu: Array, log_nu: Array,
                        iters: int, interpret: bool = False) -> Array:
    """Drop-in for ops.sinkhorn.log_sinkhorn (same contract).

    log_cost: [B, M, N]; log_mu: [B, M]; log_nu: [B, N].
    """
    b, m, n = log_cost.shape
    mu3 = log_mu[:, :, None]
    nu3 = log_nu[:, None, :]
    spec = lambda shape: pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sinkhorn_kernel, iters=iters),
        grid=(b,),
        in_specs=[spec((m, n)), spec((m, 1)), spec((1, n))],
        out_specs=spec((m, n)),
        out_shape=jax.ShapeDtypeStruct(log_cost.shape, log_cost.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * iters * m * n,
            bytes_accessed=2 * b * m * n * 4,
            transcendentals=2 * b * iters * m * n),
        interpret=interpret,
    )(log_cost, mu3, nu3)
