"""Pallas TPU kernels: fused masked linear + full attention.

The north-star kernels of the build (BASELINE.json): OETR's correlation
cross-attention (reference spec: /root/reference/src/models/
linear_attention.py:22-87) as single fused VMEM-resident kernels — the
elu+1 feature map, padding masks, KV contraction, normalizer and rescale
all happen in one pass with no HBM round-trips for intermediates.

Design notes (v5e):
  * Grid is (B,); each program holds the full [L, H*D] token block in
    VMEM (512 x 256 bf16 = 256 KB) and loops statically over heads with
    static slices — no [B,L,H,D] -> [B,H,L,D] transpose traffic in HBM.
  * Matmuls keep the input dtype (bf16 on the fast MXU path) and
    accumulate in f32 via preferred_element_type.
  * Masks ride as [B, L, 1] / [B, 1, S] so trailing block dims equal the
    array dims (TPU tiling rule) and broadcast without 1-D reshapes.

Public entry points mirror ops/attention.py signatures and are validated
against them in tests (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _elu_p1(x: Array) -> Array:
    # elu(x)+1 without expm1 (unsupported in the TPU lowering); computed in
    # f32 because bf16 vector compares don't lower on v5e, cast back so the
    # following matmuls stay on the fast bf16 MXU path.
    x32 = x.astype(jnp.float32)
    return jnp.where(x32 > 0, x32 + 1.0, jnp.exp(x32)).astype(x.dtype)


def _linear_attn_kernel(q_ref, k_ref, v_ref, qm_ref, km_ref, o_ref, *,
                        nhead: int, eps: float):
    """One batch row: fused linear attention over all heads.

    Blocks: q [1, L, H*D]; k, v [1, S, H*D]; qm [1, L, 1]; km [1, S, 1].
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qm = qm_ref[0].astype(q.dtype)                 # [L, 1]
    km = km_ref[0].astype(q.dtype)                 # [S, 1]

    Q = _elu_p1(q) * qm
    K = _elu_p1(k) * km
    V = v * km

    s = V.shape[0]
    d = q.shape[-1] // nhead
    inv_s = 1.0 / s
    for h in range(nhead):
        sl = slice(h * d, (h + 1) * d)
        Kh = K[:, sl]
        Qh = Q[:, sl]
        Vh = V[:, sl] * inv_s                      # fp16-overflow guard parity
        kv = jnp.dot(Kh.T, Vh, preferred_element_type=jnp.float32)   # [D, D]
        k_sum = jnp.sum(Kh.astype(jnp.float32), axis=0, keepdims=True)  # [1, D]
        z = 1.0 / (jnp.dot(Qh, k_sum.T.astype(Qh.dtype),
                           preferred_element_type=jnp.float32) + eps)  # [L, 1]
        out = jnp.dot(Qh, kv.astype(Qh.dtype),
                      preferred_element_type=jnp.float32) * z * s
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _full_attn_kernel(q_ref, k_ref, v_ref, qm_ref, km_ref, o_ref, *,
                      nhead: int):
    """One batch row: fused softmax attention over all heads."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qm = qm_ref[0] > 0                             # [L, 1]
    km = km_ref[0] > 0                             # [1, S]
    pair = qm & km                                 # [L, S]

    d = q.shape[-1] // nhead
    temp = 1.0 / (d ** 0.5)
    for h in range(nhead):
        sl = slice(h * d, (h + 1) * d)
        logits = jnp.dot(q[:, sl], k[:, sl].T,
                         preferred_element_type=jnp.float32) * temp
        logits = jnp.where(pair, logits, -jnp.inf)
        m = jnp.max(logits, axis=1, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)     # all-masked rows
        p = jnp.exp(logits - m)
        p = jnp.where(pair, p, 0.0)
        denom = jnp.sum(p, axis=1, keepdims=True)
        attn = (p / jnp.maximum(denom, 1e-30)).astype(v.dtype)
        out = jnp.dot(attn, v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _prep_masks(q, k, q_mask, kv_mask):
    b, l = q.shape[0], q.shape[1]
    s = k.shape[1]
    qm = (jnp.ones((b, l), jnp.float32) if q_mask is None
          else q_mask.astype(jnp.float32))
    km = (jnp.ones((b, s), jnp.float32) if kv_mask is None
          else kv_mask.astype(jnp.float32))
    return qm, km


def _call_attention(kernel, q, k, v, qm, km, km_layout, interpret,
                    cost_estimate):
    b, l, h, d = q.shape
    s = k.shape[1]
    qf = q.reshape(b, l, h * d)
    kf = k.reshape(b, s, h * d)
    vf = v.reshape(b, s, h * d)
    qm3 = qm[:, :, None]                            # [B, L, 1]
    km3 = km[:, :, None] if km_layout == "col" else km[:, None, :]

    token_spec = lambda n: pl.BlockSpec((1, n, h * d), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
    mask_spec = lambda shape: pl.BlockSpec((1,) + shape,
                                           lambda i: (i, 0, 0),
                                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[token_spec(l), token_spec(s), token_spec(s),
                  mask_spec((l, 1)),
                  mask_spec((s, 1) if km_layout == "col" else (1, s))],
        out_specs=token_spec(l),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        interpret=interpret,
        cost_estimate=cost_estimate,
    )(qf, kf, vf, qm3, km3)
    return out.reshape(b, l, h, d)


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_attention_pallas(q: Array, k: Array, v: Array,
                            q_mask: Array | None = None,
                            kv_mask: Array | None = None,
                            eps: float = 1e-6,
                            interpret: bool = False) -> Array:
    """Fused linear attention. Same contract as ops.attention.linear_attention.

    q: [B, L, H, D]; k, v: [B, S, H, D]; masks [B, L] / [B, S].
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    qm, km = _prep_masks(q, k, q_mask, kv_mask)
    cost = pl.CostEstimate(
        flops=2 * b * h * (s * d * d + l * d * d + l * d),
        bytes_accessed=2 * b * (l * h * d * 2 + 2 * s * h * d),
        transcendentals=b * h * (l + s) * d,
    )
    return _call_attention(
        functools.partial(_linear_attn_kernel, nhead=h, eps=eps),
        q, k, v, qm, km, "col", interpret, cost)


@functools.partial(jax.jit, static_argnames=("interpret",))
def full_attention_pallas(q: Array, k: Array, v: Array,
                          q_mask: Array | None = None,
                          kv_mask: Array | None = None,
                          interpret: bool = False) -> Array:
    """Fused softmax attention. Same contract as ops.attention.full_attention.

    Whole-row softmax in VMEM — valid for S up to ~4k tokens; the
    stride-16 full-resolution regime (~15k tokens) should use a streaming
    flash variant (XLA fallback today).
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    qm, km = _prep_masks(q, k, q_mask, kv_mask)
    cost = pl.CostEstimate(
        flops=4 * b * h * l * s * d,
        bytes_accessed=2 * b * (l * h * d * 2 + 2 * s * h * d),
        transcendentals=b * h * l * s,
    )
    return _call_attention(
        functools.partial(_full_attn_kernel, nhead=h),
        q, k, v, qm, km, "row", interpret, cost)
