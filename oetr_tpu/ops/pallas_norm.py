"""Fused GroupNorm-apply + ReLU + 3x3/s2 max-pool Pallas kernel.

Round-4 target (VERDICT r3 #4): the flagship OETR forward runs every
stage at its memory-bound speed of light EXCEPT stem+layer1 (66%,
PERF.md) — the stem's GroupNorm + ReLU + max-pool chain makes three
extra full-resolution passes over the [B, 320, 320, 64] conv output
(stats read, normalize read+write, pool read + quarter-size write).
This kernel collapses the *apply* side to a single read -> quarter-size
write: the per-(batch, channel) affine (scale, shift) is precomputed
from the GroupNorm statistics by one XLA reduction pass (reductions are
already at SoL there), and normalize+ReLU+pool happen in VMEM.

The 3x3/s2 pool needs a one-row halo on each side of a row tile.
Manual HBM->VMEM DMA for the overlapping window does not compile on the
tunneled Mosaic toolchain, so the halo rides as two extra ONE-ROW
BlockSpec inputs of the same array whose index_map clamps at the image
border — which simultaneously implements the edge behaviour: pool
semantics match flax.linen.max_pool(window (3, 3), strides (2, 2),
padding ((1, 1), (1, 1))) because the pooled input is post-ReLU
(>= 0), so a clamped duplicate of a row/column already inside the
window is exactly equivalent to -inf edge padding (a duplicated value
never changes a max), and the kernel needs no masks and no
program-id-dependent slicing.

The reference keeps these as separate torch ops (resnet stem,
/root/reference/src/models/backbone.py:159-174 via torchvision); there
is no reference kernel to port — this is TPU-native new scope.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def gn_scale_shift(x: Array, gamma: Array, beta: Array, num_groups: int,
                   eps: float):
    """Per-(batch, channel) affine equivalent of GroupNorm.

    Returns (scale [B, C], shift [B, C]) in float32 such that
    GN(x) = x * scale + shift.
    """
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, num_groups,
                                       c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3))                       # [B, G]
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)                         # [B, G]
    rep = c // num_groups
    inv_c = jnp.repeat(inv, rep, axis=1)                   # [B, C]
    mean_c = jnp.repeat(mean, rep, axis=1)
    g32 = gamma.astype(jnp.float32)[None, :]
    scale = inv_c * g32
    shift = beta.astype(jnp.float32)[None, :] - mean_c * inv_c * g32
    return scale, shift


def _apply_pool_kernel(xm_ref, xb_ref, xa_ref, scale_ref, shift_ref,
                       out_ref, *, toh: int, w: int):
    """One (batch, output-row-tile) grid step.

    Blocks: xm [1, 2*toh, W, C] (the tile's own input rows), xb/xa
    [1, 1, W, C] (border-clamped halo row before/after), scale/shift
    [1, 1, C]; out [1, toh, W/2, C]. Window row k is input row
    2*r0 - 1 + k (edge rows duplicated by the clamped index_map).
    """
    win = jnp.concatenate([xb_ref[0], xm_ref[0], xa_ref[0]], axis=0)
    scale = scale_ref[0]                   # [1, C] f32
    shift = shift_ref[0]
    y = jnp.maximum(win.astype(jnp.float32) * scale[None, :, :]
                    + shift[None, :, :], 0.0)              # [L, W, C]

    # Column max over {2w-1, 2w, 2w+1} (edge-clamped; see module note).
    # Even/odd columns via reshape — Mosaic has no strided-slice
    # lowering (y[:, 0:w:2] fails with "only 2D gather is supported").
    L, _, c = y.shape
    yr = y.reshape(L, w // 2, 2, c)
    even = yr[:, :, 0]                                     # cols 2w
    odd = yr[:, :, 1]                                      # cols 2w+1
    odd_shift = jnp.concatenate([even[:, :1], odd[:, :-1]], axis=1)
    z = jnp.maximum(jnp.maximum(even, odd), odd_shift)     # [L, W/2, C]

    # Row max over window rows {2j, 2j+1, 2j+2} (= input rows
    # 2(r0+j)-1 + {0,1,2}): three static slices, keep even rows.
    rows = [z[k:k + 2 * toh].reshape(toh, 2, w // 2, c)[:, 0]
            for k in range(3)]
    out = jnp.maximum(jnp.maximum(rows[0], rows[1]), rows[2])
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_groups", "eps", "toh", "interpret"))
def groupnorm_relu_maxpool(x: Array, gamma: Array, beta: Array,
                           num_groups: int = 32, eps: float = 1e-5,
                           toh: int = 10, interpret: bool = False) -> Array:
    """GroupNorm -> ReLU -> max_pool(3x3, s2, pad (1, 1)) fused.

    x: [B, H, W, C] with H % (2*toh) == 0 and W even. Returns
    [B, H/2, W/2, C] in x.dtype.
    """
    b, h, w, c = x.shape
    assert h % (2 * toh) == 0 and w % 2 == 0, (h, w, toh)
    scale, shift = gn_scale_shift(x, gamma, beta, num_groups, eps)

    def before_idx(bi, ti):
        # Row-unit block index of the halo row above the tile, clamped
        # at the top border (duplicate of row 0 — harmless, see module
        # docstring).
        return (bi, jnp.maximum(2 * toh * ti - 1, 0), 0, 0)

    def after_idx(bi, ti):
        return (bi, jnp.minimum(2 * toh * (ti + 1), h - 1), 0, 0)

    return pl.pallas_call(
        partial(_apply_pool_kernel, toh=toh, w=w),
        grid=(b, h // (2 * toh)),
        in_specs=[
            pl.BlockSpec((1, 2 * toh, w, c), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c), before_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c), after_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, toh, w // 2, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
        interpret=interpret,
    )(x, x, x, scale[:, None, :], shift[:, None, :])


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_relu_maxpool_trainable(x: Array, gamma: Array, beta: Array,
                                     num_groups: int = 32, eps: float = 1e-5,
                                     toh: int = 10) -> Array:
    """Differentiable wrapper: Pallas forward, XLA-reference backward.

    The kernel is an inference-path optimization; training steps that
    hit it simply recompute the (already-fused-enough) XLA graph for
    the VJP, so the fused stem can stay enabled everywhere.
    """
    interpret = jax.default_backend() == "cpu"
    return groupnorm_relu_maxpool(x, gamma, beta, num_groups, eps,
                                  toh=toh, interpret=interpret)


def _gnrm_fwd(x, gamma, beta, num_groups, eps, toh):
    return (groupnorm_relu_maxpool_trainable(x, gamma, beta, num_groups,
                                             eps, toh),
            (x, gamma, beta))


def _gnrm_bwd(num_groups, eps, toh, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda xx, gg, bb: groupnorm_relu_maxpool_reference(
            xx, gg, bb, num_groups, eps), x, gamma, beta)
    return vjp(g)


groupnorm_relu_maxpool_trainable.defvjp(_gnrm_fwd, _gnrm_bwd)


def groupnorm_relu_maxpool_reference(x: Array, gamma: Array, beta: Array,
                                     num_groups: int = 32,
                                     eps: float = 1e-5) -> Array:
    """XLA reference path (flax semantics) — the parity oracle."""
    import flax.linen as nn

    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    y = jnp.maximum(y, 0.0).astype(x.dtype)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
