"""Attention primitives: masked linear attention + full attention.

jnp reference implementations with the exact semantics of the reference's
LinearAttention / FullAttention (/root/reference/src/models/
linear_attention.py:16-87). These are the correctness oracles for the
fused Pallas kernels in ops/pallas_attention.py; XLA already fuses them
well enough to be the default path at OETR's sequence lengths (~400).

Layout: [B, N, H, D] ("NLHD") matching the reference, which is also the
natural layout for TPU (contraction dims last, batch/heads leading).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def elu_feature_map(x: Array) -> Array:
    """elu(x) + 1 positive feature map (ref: linear_attention.py:12-13)."""
    return jax.nn.elu(x) + 1.0


def linear_attention(q: Array, k: Array, v: Array,
                     q_mask: Array | None = None,
                     kv_mask: Array | None = None,
                     eps: float = 1e-6) -> Array:
    """O(N·D²) linear attention ("Transformers are RNNs").

    Ref semantics: linear_attention.py:22-50 including the value/length
    rescale guarding fp16 overflow (harmless but kept for numerical parity)
    and zeroing of padded K/V positions.

    Args:
      q: [B, L, H, D]; k, v: [B, S, H, D].
      q_mask: [B, L] bool; kv_mask: [B, S] bool (True = real token).
    Returns:
      [B, L, H, D].
    """
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
        v = v * kv_mask[:, :, None, None].astype(v.dtype)

    v_length = v.shape[1]
    v_scaled = v / v_length
    KV = jnp.einsum("nshd,nshv->nhdv", K, v_scaled)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
    return out


def full_attention(q: Array, k: Array, v: Array,
                   q_mask: Array | None = None,
                   kv_mask: Array | None = None) -> Array:
    """Softmax attention with -inf masking of padded pairs.

    Ref semantics: linear_attention.py:59-87 (softmax temperature
    1/sqrt(D), joint q/kv mask).

    Args:
      q: [B, L, H, D]; k, v: [B, S, H, D]; masks [B, L] / [B, S] bool.
    Returns:
      [B, L, H, D].
    """
    qk = jnp.einsum("nlhd,nshd->nlsh", q, k)
    if kv_mask is not None:
        if q_mask is None:
            pair = kv_mask[:, None, :, None]
        else:
            pair = (q_mask[:, :, None, None] & kv_mask[:, None, :, None])
        qk = jnp.where(pair, qk, jnp.asarray(-jnp.inf, qk.dtype))
    temp = 1.0 / (q.shape[-1] ** 0.5)
    attn = jax.nn.softmax(temp * qk, axis=2)
    if kv_mask is not None:
        # Rows with no visible keys softmax to NaN; zero them like the
        # linear path does.
        attn = jnp.nan_to_num(attn)
    return jnp.einsum("nlsh,nshd->nlhd", attn, v)
