"""OETR query transformer in flax.linen.

Re-designs /root/reference/src/models/transformer.py for TPU: same
topology — num_layers x (self + cross) pre-norm encoder over both images'
token streams, then a 2-layer query decoder per image with a single
learned query — but expressed as linen modules over [B, N, C] token
tensors with boolean validity masks, using the masked attention ops in
oetr_tpu.ops.attention (fused by XLA / replaceable by Pallas kernels).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import full_attention, linear_attention

Array = jnp.ndarray


def _attend(kind: str, q, k, v, q_mask, kv_mask, use_pallas: bool = False):
    """Dispatch the attention primitive. ``kind``:
      'linear' | 'full'              — XLA reference ops (ops/attention.py)
      'linear:pallas' | 'full:pallas' — fused VMEM-resident TPU kernels
      'full:flash'                   — streaming KV-blocked Pallas kernel
                                       (long sequences, stride-16 maps)
      'full:ring'                    — sequence-parallel ring attention;
                                       requires parallel.ring_context(mesh)
                                       around the call (trace time).

    On non-TPU backends the Pallas kinds silently use the numerically
    equivalent XLA ops (kernel==op parity is pinned by
    tests/test_pallas_kernels.py; interpret mode is 100-1000x slower and
    only useful for debugging — opt in with OETR_PALLAS_INTERPRET=1).
    Tiny q/kv blocks (the decoder's single learned query) also use the
    XLA ops: no MXU win, and sub-tile shapes stress Mosaic for nothing.
    """
    import os

    import jax

    on_tpu = jax.default_backend() == "tpu"
    interpret = (not on_tpu) and bool(os.environ.get(
        "OETR_PALLAS_INTERPRET"))
    pallas_ok = (on_tpu or interpret) and q.shape[1] >= 8 and k.shape[1] >= 8
    if kind.endswith(":pallas"):
        kind = kind.split(":")[0]
        use_pallas = True
    if kind == "full:flash":
        if not pallas_ok:
            return full_attention(q, k, v, q_mask, kv_mask)
        from ..ops.pallas_attention import flash_attention_pallas
        return flash_attention_pallas(q, k, v, q_mask, kv_mask,
                                      interpret=interpret)
    if kind == "full:ring":
        from ..parallel.ring_attention import (current_ring_context,
                                               ring_attention)
        ctx = current_ring_context()
        if ctx is None:
            raise ValueError("attention='full:ring' requires wrapping the "
                             "forward in parallel.ring_context(mesh, axis)")
        mesh, axis = ctx
        if k.shape[1] % mesh.shape[axis] != 0:
            # Short K/V (e.g. the decoder's single learned query) can't
            # shard over the ring — plain attention is also cheaper there.
            return full_attention(q, k, v, q_mask, kv_mask)
        out = ring_attention(q, k, v, mesh, axis, kv_mask=kv_mask)
        if q_mask is not None:
            out = out * q_mask[:, :, None, None].astype(out.dtype)
        return out
    if use_pallas and pallas_ok:
        from ..ops.pallas_attention import (full_attention_pallas,
                                            linear_attention_pallas)
        fn = (linear_attention_pallas if kind == "linear"
              else full_attention_pallas)
        return fn(q, k, v, q_mask, kv_mask, interpret=interpret)
    if kind == "linear":
        return linear_attention(q, k, v, q_mask, kv_mask)
    if kind == "full":
        return full_attention(q, k, v, q_mask, kv_mask)
    raise ValueError(f"unknown attention {kind!r}")


class _RawKernel(nn.Module):
    """Bare Dense-kernel param holder (same scope/param name as
    nn.Dense(use_bias=False)) for fused kernels that consume raw
    weights."""
    shape: tuple

    @nn.compact
    def __call__(self) -> Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _RawLN(nn.Module):
    """Bare LayerNorm param holder (scale/bias rows stacked [2, C])."""
    dim: int

    @nn.compact
    def __call__(self) -> Array:
        return jnp.stack([
            self.param("scale", nn.initializers.ones, (self.dim,),
                       jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.dim,),
                       jnp.float32)])


class EncoderLayer(nn.Module):
    """Pre-norm encoder layer (ref: transformer.py:75-142).

    Positional encodings are added to q, k *and* v after the pre-norms,
    exactly like the reference (transformer.py:123-126).
    """
    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, source: Array,
                 x_mask: Array | None = None,
                 source_mask: Array | None = None,
                 x_pos: Array | None = None,
                 s_pos: Array | None = None) -> Array:
        import os

        import jax

        b, n, _ = x.shape
        head_dim = self.d_model // self.nhead
        dense = lambda name: nn.Dense(self.d_model, use_bias=False,
                                      dtype=self.dtype, name=name)

        on_tpu = jax.default_backend() == "tpu"
        interpret = (not on_tpu) and bool(os.environ.get(
            "OETR_PALLAS_INTERPRET"))
        if (self.attention == "linear:pallas" and x_pos is not None
                and (on_tpu or interpret) and n >= 8):
            # Whole-sublayer fused kernel (round 4): the bare attention
            # kernel's microbench win inverted end to end because
            # pre-norm/PE stopped fusing across the pallas_call boundary
            # (PERF.md r3); LN + PE + projections + attention now run in
            # one VMEM-resident program. Raw param modules reuse the
            # exact scope/param names of the unfused branch, so both
            # paths share checkpoints (and fresh inits are identical —
            # flax derives param RNG from the scope path).
            from ..ops.pallas_attention import linear_encoder_attention_pallas
            lnq = _RawLN(self.d_model, name="pre_norm_q")()
            lnkv = _RawLN(self.d_model, name="pre_norm_kv")()
            wq = _RawKernel((self.d_model, self.d_model), name="q_proj")()
            wk = _RawKernel((self.d_model, self.d_model), name="k_proj")()
            wv = _RawKernel((self.d_model, self.d_model), name="v_proj")()
            xd = x.astype(self.dtype)
            sd = source.astype(self.dtype)
            message = linear_encoder_attention_pallas(
                xd, sd, x_pos, s_pos, lnq, lnkv, wq, wk, wv,
                x_mask, source_mask, nhead=self.nhead, interpret=interpret)
        else:
            query = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="pre_norm_q")(x)
            kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="pre_norm_kv")(source)
            key = value = kv
            if x_pos is not None:
                query = query + x_pos
                key = key + s_pos
                value = value + s_pos

            q = dense("q_proj")(query).reshape(b, n, self.nhead, head_dim)
            k = dense("k_proj")(key).reshape(b, -1, self.nhead, head_dim)
            v = dense("v_proj")(value).reshape(b, -1, self.nhead, head_dim)
            message = _attend(self.attention, q, k, v, x_mask, source_mask)
            message = message.reshape(b, n, self.d_model)
        message = dense("merge")(message)

        x = x + message
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.d_model * 2, use_bias=False, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype)(y)
        return x + y


class MultiHeadAttention(nn.Module):
    """Biased-projection MHA used inside decoder layers (ref: transformer.py:23-72)."""
    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 q_mask: Array | None = None,
                 kv_mask: Array | None = None) -> Array:
        b, n, _ = q.shape
        head_dim = self.d_model // self.nhead
        qh = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(q)
        kh = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(k)
        vh = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(v)
        qh = qh.reshape(b, n, self.nhead, head_dim)
        kh = kh.reshape(b, -1, self.nhead, head_dim)
        vh = vh.reshape(b, -1, self.nhead, head_dim)
        out = _attend(self.attention, qh, kh, vh, q_mask, kv_mask)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                        name="merge")(out.reshape(b, n, self.d_model))


class DecoderLayer(nn.Module):
    """Query decoder layer: self-attn + cross-attn + ReLU MLP
    (ref: transformer.py:189-255, dropout 0.1)."""
    d_model: int
    nhead: int
    dropout: float = 0.1
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array,
                 memory_mask: Array | None = None,
                 tgt_pos: Array | None = None,
                 m_pos: Array | None = None,
                 deterministic: bool = True) -> Array:
        drop = lambda z: nn.Dropout(self.dropout, deterministic=deterministic)(z)

        tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        qk = tgt2 if tgt_pos is None else tgt2 + tgt_pos
        tgt2 = MultiHeadAttention(self.d_model, self.nhead, self.attention,
                                  self.dtype, name="self_attn")(qk, qk, tgt2)
        tgt = tgt + drop(tgt2)

        tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
        q = tgt2 if tgt_pos is None else tgt2 + tgt_pos
        k = memory if m_pos is None else memory + m_pos
        tgt2 = MultiHeadAttention(self.d_model, self.nhead, self.attention,
                                  self.dtype, name="cross_attn")(
            q, k, memory, kv_mask=memory_mask)
        tgt = tgt + drop(tgt2)

        tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        tgt2 = nn.Dense(self.d_model * 2, use_bias=False, dtype=self.dtype)(tgt2)
        tgt2 = nn.relu(tgt2)
        tgt2 = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype)(tgt2)
        return tgt + tgt2


class QueryTransformer(nn.Module):
    """Joint encoder over both images + per-image query decoder.

    Ref: transformer.py:287-383. Inputs are token tensors [B, N, C]
    (callers flatten NHWC feature maps; token order equals the reference's
    NCHW flatten order) plus per-token validity masks.

    Returns (hs0, hs1, memory0, memory1): query embeddings [B, 1, C] and
    contextualized features [B, N, C].
    """
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 4
    num_decoder_layers: int = 2
    attention: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat0: Array, feat1: Array, query_embed0: Array,
                 query_embed1: Array, pos0: Array, pos1: Array,
                 mask0: Array | None = None, mask1: Array | None = None,
                 deterministic: bool = True):
        b = feat0.shape[0]
        q0 = jnp.broadcast_to(query_embed0[None], (b, *query_embed0.shape))
        q0 = q0.astype(self.dtype)
        q1 = jnp.broadcast_to(query_embed1[None], (b, *query_embed1.shape))
        q1 = q1.astype(self.dtype)

        # Alternating self/cross encoder (ref: transformer.py:349-358).
        for i in range(self.num_layers):
            self_layer = EncoderLayer(self.d_model, self.nhead, self.attention,
                                      self.dtype, name=f"enc_self_{i}")
            cross_layer = EncoderLayer(self.d_model, self.nhead, self.attention,
                                       self.dtype, name=f"enc_cross_{i}")
            feat0 = self_layer(feat0, feat0, mask0, mask0, pos0, pos0)
            feat1 = self_layer(feat1, feat1, mask1, mask1, pos1, pos1)
            src0, src1 = feat1, feat0
            feat0 = cross_layer(feat0, src0, mask0, mask1, pos0, pos1)
            feat1 = cross_layer(feat1, src1, mask1, mask0, pos1, pos0)

        # Query decoders share weights across the two images (the reference
        # calls the same self.decoder for both streams, transformer.py:363-381).
        decoder_layers = [
            DecoderLayer(self.d_model, self.nhead, attention=self.attention,
                         dtype=self.dtype, name=f"dec_{i}")
            for i in range(self.num_decoder_layers)
        ]

        def run_decoder(tgt_pos, memory, memory_mask, m_pos):
            tgt = jnp.zeros_like(tgt_pos)
            for layer in decoder_layers:
                tgt = layer(tgt, memory, memory_mask=memory_mask,
                            tgt_pos=tgt_pos, m_pos=m_pos,
                            deterministic=deterministic)
            return tgt

        hs0 = run_decoder(q0, feat0, mask0, pos0)
        hs1 = run_decoder(q1, feat1, mask1, pos1)
        return hs0, hs1, feat0, feat1


class ChannelAttention(nn.Module):
    """CBAM channel gate (ref: transformer.py:386-404; unused in the
    reference's main path, kept for component parity). Input [B, N, C]
    tokens; avg+max pool over tokens -> shared 2-layer MLP -> sigmoid."""
    d_model: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = max(self.d_model // self.reduction, 1)
        fc1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       name="fc2")
        avg = fc2(nn.relu(fc1(jnp.mean(x, axis=1))))
        mx = fc2(nn.relu(fc1(jnp.max(x, axis=1))))
        gate = nn.sigmoid((avg + mx).astype(jnp.float32)).astype(x.dtype)
        return x * gate[:, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial gate (ref: transformer.py:406-422). Input [B, H, W, C];
    channel avg+max maps -> kxk conv -> sigmoid."""
    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        g = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=False,
                    dtype=self.dtype, name="conv")(
                        jnp.concatenate([avg, mx], axis=-1))
        return x * nn.sigmoid(g.astype(jnp.float32)).astype(x.dtype)
