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
        den = jnp.dot(Qh, k_sum.T.astype(Qh.dtype),
                      preferred_element_type=jnp.float32)            # [L, 1]
        # NB: `den + eps` trips Mosaic ("only neutral accumulator
        # supported for float reduction" — it folds the constant into the
        # reduction init); clamping is equivalent here since den >= 0
        # (elu+1 > 0 and masked K rows are exactly 0).
        z = 1.0 / jnp.maximum(den, eps)
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


def _with_xla_vjp(pallas_fwd, xla_op):
    """Make a Pallas forward differentiable: fused kernel on the primal
    pass, the numerically-identical XLA op's VJP on the backward pass
    (the standard production pattern — training works, inference keeps
    the kernel win; kernel==op parity is pinned by tests).

    Both callables take (q, k, v, qm, km) with float masks.
    """
    @jax.custom_vjp
    def f(q, k, v, qm, km):
        return pallas_fwd(q, k, v, qm, km)

    def fwd(q, k, v, qm, km):
        return pallas_fwd(q, k, v, qm, km), (q, k, v, qm, km)

    def bwd(res, g):
        q, k, v, qm, km = res
        _, vjp = jax.vjp(lambda q_, k_, v_: xla_op(q_, k_, v_, qm > 0,
                                                   km > 0), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, jnp.zeros_like(qm), jnp.zeros_like(km)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_attention_pallas(q: Array, k: Array, v: Array,
                            q_mask: Array | None = None,
                            kv_mask: Array | None = None,
                            eps: float = 1e-6,
                            interpret: bool = False) -> Array:
    """Fused linear attention. Same contract as ops.attention.linear_attention.

    q: [B, L, H, D]; k, v: [B, S, H, D]; masks [B, L] / [B, S].
    Differentiable: backward runs the XLA op's VJP (_with_xla_vjp).
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    qm, km = _prep_masks(q, k, q_mask, kv_mask)
    cost = pl.CostEstimate(
        flops=2 * b * h * (s * d * d + l * d * d + l * d),
        bytes_accessed=2 * b * (l * h * d * 2 + 2 * s * h * d),
        transcendentals=b * h * (l + s) * d,
    )

    def pallas_fwd(q, k, v, qm, km):
        return _call_attention(
            functools.partial(_linear_attn_kernel, nhead=h, eps=eps),
            q, k, v, qm, km, "col", interpret, cost)

    from .attention import linear_attention as xla_op
    return _with_xla_vjp(pallas_fwd, xla_op)(q, k, v, qm, km)


@functools.partial(jax.jit, static_argnames=("interpret",))
def full_attention_pallas(q: Array, k: Array, v: Array,
                          q_mask: Array | None = None,
                          kv_mask: Array | None = None,
                          interpret: bool = False) -> Array:
    """Fused softmax attention. Same contract as ops.attention.full_attention.

    Whole-row softmax in VMEM — valid for S up to ~4k tokens; the
    stride-16 full-resolution regime (~15k tokens) uses the streaming
    ``flash_attention_pallas`` below.
    Differentiable: backward runs the XLA op's VJP (_with_xla_vjp).
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    qm, km = _prep_masks(q, k, q_mask, kv_mask)
    cost = pl.CostEstimate(
        flops=4 * b * h * l * s * d,
        bytes_accessed=2 * b * (l * h * d * 2 + 2 * s * h * d),
        transcendentals=b * h * l * s,
    )

    def pallas_fwd(q, k, v, qm, km):
        return _call_attention(
            functools.partial(_full_attn_kernel, nhead=h),
            q, k, v, qm, km, "row", interpret, cost)

    from .attention import full_attention as xla_op
    return _with_xla_vjp(pallas_fwd, xla_op)(q, k, v, qm, km)


def _flash_attn_kernel(q_ref, k_ref, v_ref, qm_ref, km_ref, o_ref,
                       acc_ref, max_ref, sum_ref, *, nhead: int,
                       n_kv: int):
    """Streaming (KV-blocked) softmax attention — one (batch, q-block)
    output tile, revisited across the kv grid dimension with online
    softmax accumulation in VMEM scratch.

    Blocks: q [1, BQ, H*D]; k, v [1, BK, H*D]; qm [1, BQ, 1];
    km [1, 1, BK]; out [1, BQ, H*D]. Scratch: acc [BQ, H*D] f32,
    max/sum [BQ, H] f32.
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        max_ref[:] = jnp.full_like(max_ref, -jnp.inf)
        sum_ref[:] = jnp.zeros_like(sum_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    pair = (qm_ref[0] > 0) & (km_ref[0] > 0)        # [BQ, BK]

    d = q.shape[-1] // nhead
    temp = 1.0 / (d ** 0.5)
    for h in range(nhead):
        sl = slice(h * d, (h + 1) * d)
        logits = jnp.dot(q[:, sl], k[:, sl].T,
                         preferred_element_type=jnp.float32) * temp
        logits = jnp.where(pair, logits, -jnp.inf)

        prev_max = max_ref[:, h:h + 1]               # [BQ, 1]
        blk_max = jnp.max(logits, axis=1, keepdims=True)
        new_max = jnp.maximum(prev_max, blk_max)
        safe_max = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
        corr = jnp.exp(prev_max - safe_max)
        corr = jnp.where(jnp.isfinite(prev_max), corr, 0.0)   # [BQ, 1]

        p = jnp.exp(logits - safe_max)
        p = jnp.where(pair, p, 0.0)                  # [BQ, BK] f32

        acc_ref[:, sl] = (acc_ref[:, sl] * corr +
                          jnp.dot(p.astype(v.dtype), v[:, sl],
                                  preferred_element_type=jnp.float32))
        sum_ref[:, h:h + 1] = (sum_ref[:, h:h + 1] * corr +
                               jnp.sum(p, axis=1, keepdims=True))
        max_ref[:, h:h + 1] = new_max

    @pl.when(ik == n_kv - 1)
    def _final():
        for h in range(nhead):
            sl = slice(h * d, (h + 1) * d)
            denom = jnp.maximum(sum_ref[:, h:h + 1], 1e-30)
            o_ref[0, :, sl] = (acc_ref[:, sl] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention_pallas(q: Array, k: Array, v: Array,
                           q_mask: Array | None = None,
                           kv_mask: Array | None = None,
                           block_q: int = 512, block_k: int = 512,
                           interpret: bool = False) -> Array:
    """Streaming flash attention for long sequences (stride-16 maps,
    ~15k tokens — SURVEY.md §2.7's SP/long-context regime).

    Same contract as ops.attention.full_attention but VMEM holds only
    [block_q x block_k] logit tiles; sequence length is bounded by HBM,
    not VMEM. L and S are padded to the block sizes internally (padding
    rides the masks, so numerics match the unpadded oracle).
    """
    b, l, h, d = q.shape
    s = k.shape[1]
    qm0, km0 = _prep_masks(q, k, q_mask, kv_mask)

    def pallas_fwd(q, k, v, qm, km):
        lp = -(-l // block_q) * block_q
        sp = -(-s // block_k) * block_k
        if lp != l:
            q = jnp.pad(q, ((0, 0), (0, lp - l), (0, 0), (0, 0)))
            qm = jnp.pad(qm, ((0, 0), (0, lp - l)))
        if sp != s:
            k = jnp.pad(k, ((0, 0), (0, sp - s), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, sp - s), (0, 0), (0, 0)))
            km = jnp.pad(km, ((0, 0), (0, sp - s)))

        qf = q.reshape(b, lp, h * d)
        kf = k.reshape(b, sp, h * d)
        vf = v.reshape(b, sp, h * d)
        qm3 = qm[:, :, None]
        km3 = km[:, None, :]
        n_q = lp // block_q
        n_kv = sp // block_k

        out = pl.pallas_call(
            functools.partial(_flash_attn_kernel, nhead=h, n_kv=n_kv),
            grid=(b, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, block_q, h * d),
                             lambda ib, iq, ik: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, h * d),
                             lambda ib, iq, ik: (ib, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, h * d),
                             lambda ib, iq, ik: (ib, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1),
                             lambda ib, iq, ik: (ib, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k),
                             lambda ib, iq, ik: (ib, 0, ik),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, h * d),
                                   lambda ib, iq, ik: (ib, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, lp, h * d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, h * d), jnp.float32),
                pltpu.VMEM((block_q, h), jnp.float32),
                pltpu.VMEM((block_q, h), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * lp * sp * d,
                bytes_accessed=2 * b * (lp * h * d * 2 + 2 * sp * h * d),
                transcendentals=b * h * lp * sp),
            interpret=interpret,
        )(qf, kf, vf, qm3, km3)
        return out.reshape(b, lp, h, d)[:, :l]

    from .attention import full_attention as xla_op
    return _with_xla_vjp(pallas_fwd, xla_op)(q, k, v, qm0, km0)


# ---------------------------------------------------------------------------
# Whole-sublayer fused encoder attention (round 4, VERDICT r3 #6)
# ---------------------------------------------------------------------------


def _linear_encoder_kernel(x_ref, s_ref, xp_ref, sp_ref, lnq_ref, lnkv_ref,
                           wq_ref, wk_ref, wv_ref, qm_ref, km_ref, o_ref, *,
                           nhead: int, eps: float):
    """One batch row of a pre-norm encoder attention sublayer, fully
    fused: LayerNorm -> +positional encoding -> q/k/v projections ->
    masked linear attention, all VMEM-resident.

    Round-3 finding (PERF.md): the bare attention kernel's 1.65x
    microbench win inverted to -3% end to end because the pre-norm and
    PE adds stopped fusing across the pallas_call boundary (q/k/v
    round-trip through HBM). The PE add cannot move into the kernel
    alone — it precedes the projections (transformer.py:107-116, ref
    transformer.py:123-126) — so the whole sublayer moves in.

    Blocks: x [1, L, C]; src [1, S, C]; pos [1, L/S, C]; ln params
    [2, C] f32 (scale, bias); W [C, C] f32; masks as in the bare kernel.
    """
    x = x_ref[0]
    src = s_ref[0]
    qm = qm_ref[0]                                 # [L, 1] f32
    km = km_ref[0]                                 # [S, 1] f32

    def ln(t, p):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, axis=-1, keepdims=True)
        cen = t32 - mu
        var = jnp.mean(cen * cen, axis=-1, keepdims=True)
        return cen * jax.lax.rsqrt(var + 1e-5) * p[0][None, :] + p[1][None, :]

    dt = x.dtype
    q_in = (ln(x, lnq_ref[...]) + xp_ref[0].astype(jnp.float32)).astype(dt)
    kv_in = (ln(src, lnkv_ref[...]) + sp_ref[0].astype(jnp.float32)).astype(dt)

    q = jnp.dot(q_in, wq_ref[...].astype(dt),
                preferred_element_type=jnp.float32).astype(dt)
    k = jnp.dot(kv_in, wk_ref[...].astype(dt),
                preferred_element_type=jnp.float32).astype(dt)
    v = jnp.dot(kv_in, wv_ref[...].astype(dt),
                preferred_element_type=jnp.float32).astype(dt)

    Q = _elu_p1(q) * qm.astype(dt)
    K = _elu_p1(k) * km.astype(dt)
    V = v * km.astype(dt)

    s_len = V.shape[0]
    d = q.shape[-1] // nhead
    inv_s = 1.0 / s_len
    for h in range(nhead):
        sl = slice(h * d, (h + 1) * d)
        Kh = K[:, sl]
        Qh = Q[:, sl]
        Vh = V[:, sl] * inv_s
        kv = jnp.dot(Kh.T, Vh, preferred_element_type=jnp.float32)
        k_sum = jnp.sum(Kh.astype(jnp.float32), axis=0, keepdims=True)
        den = jnp.dot(Qh, k_sum.T.astype(Qh.dtype),
                      preferred_element_type=jnp.float32)
        z = 1.0 / jnp.maximum(den, eps)
        out = jnp.dot(Qh, kv.astype(Qh.dtype),
                      preferred_element_type=jnp.float32) * z * s_len
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def linear_encoder_attention_xla(x, source, x_pos, s_pos, lnq, lnkv,
                                 wq, wk, wv, q_mask, kv_mask,
                                 nhead: int = 8, eps: float = 1e-6):
    """XLA twin of the fused sublayer (parity oracle + VJP backward)."""
    from .attention import linear_attention

    def ln(t, p):
        t32 = t.astype(jnp.float32)
        mu = jnp.mean(t32, axis=-1, keepdims=True)
        cen = t32 - mu
        var = jnp.mean(cen * cen, axis=-1, keepdims=True)
        return cen * jax.lax.rsqrt(var + 1e-5) * p[0] + p[1]

    dt = x.dtype
    b, l, c = x.shape
    q_in = (ln(x, lnq) + x_pos.astype(jnp.float32)).astype(dt)
    kv_in = (ln(source, lnkv) + s_pos.astype(jnp.float32)).astype(dt)
    nh = nhead
    q = (q_in @ wq.astype(dt)).reshape(b, l, nh, c // nh)
    k = (kv_in @ wk.astype(dt)).reshape(b, -1, nh, c // nh)
    v = (kv_in @ wv.astype(dt)).reshape(b, -1, nh, c // nh)
    out = linear_attention(q, k, v, q_mask, kv_mask, eps=eps)
    return out.reshape(b, l, c)


@functools.partial(jax.jit, static_argnames=("nhead", "interpret"))
def linear_encoder_attention_pallas(x, source, x_pos, s_pos, lnq, lnkv,
                                    wq, wk, wv, q_mask, kv_mask,
                                    nhead: int = 8, eps: float = 1e-6,
                                    interpret: bool = False):
    """Fused pre-norm + PE + projections + masked linear attention.

    x [B, L, C]; source [B, S, C]; pos [B or 1, L/S, C]; lnq/lnkv
    [2, C] f32 (scale, bias rows); wq/wk/wv [C, C] f32. Returns
    [B, L, C] (pre-merge attention message). Differentiable via the XLA
    twin's VJP.
    """
    b, l, c = x.shape
    s = source.shape[1]
    qm = (jnp.ones((b, l), jnp.float32) if q_mask is None
          else q_mask.astype(jnp.float32))
    km = (jnp.ones((b, s), jnp.float32) if kv_mask is None
          else kv_mask.astype(jnp.float32))
    xp = jnp.broadcast_to(x_pos.astype(jnp.float32), (b, l, c))
    sp = jnp.broadcast_to(s_pos.astype(jnp.float32), (b, s, c))
    d = c // nhead
    cost = pl.CostEstimate(
        flops=2 * b * (3 * (l + 2 * s) // 3 * c * c
                       + nhead * (s * d * d + l * d * d + l * d)),
        bytes_accessed=2 * b * (2 * l * c + 2 * s * c) + 3 * 4 * c * c,
        transcendentals=b * (l + s) * c,
    )

    tok = lambda n: pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    mask = lambda n: pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)

    def pallas_fwd(x, source, xp, sp, lnq, lnkv, wq, wk, wv, qm, km):
        return pl.pallas_call(
            functools.partial(_linear_encoder_kernel, nhead=nhead, eps=eps),
            grid=(b,),
            in_specs=[tok(l), tok(s), tok(l), tok(s),
                      fixed((2, c)), fixed((2, c)),
                      fixed((c, c)), fixed((c, c)), fixed((c, c)),
                      mask(l), mask(s)],
            out_specs=tok(l),
            out_shape=jax.ShapeDtypeStruct((b, l, c), x.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(x, source, xp, sp, lnq, lnkv, wq, wk, wv,
          qm[:, :, None], km[:, :, None])

    @jax.custom_vjp
    def f(x, source, xp, sp, lnq, lnkv, wq, wk, wv, qm, km):
        return pallas_fwd(x, source, xp, sp, lnq, lnkv, wq, wk, wv, qm, km)

    def fwd(*args):
        return pallas_fwd(*args), args

    def bwd(res, g):
        (x, source, xp, sp, lnq, lnkv, wq, wk, wv, qm, km) = res
        _, vjp = jax.vjp(
            lambda x_, s_, xp_, sp_, lnq_, lnkv_, wq_, wk_, wv_:
            linear_encoder_attention_xla(x_, s_, xp_, sp_, lnq_, lnkv_,
                                         wq_, wk_, wv_, qm > 0, km > 0,
                                         nhead, eps),
            x, source, xp, sp, lnq, lnkv, wq, wk, wv)
        grads = vjp(g)
        return grads + (jnp.zeros_like(qm), jnp.zeros_like(km))

    f.defvjp(fwd, bwd)
    return f(x, source, xp, sp, lnq, lnkv, wq, wk, wv, qm, km)
