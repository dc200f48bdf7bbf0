"""Fused GroupNorm-apply + ReLU + 3x3/s2 max-pool Pallas kernel.

Round-4 target (VERDICT r3 #4): the flagship OETR forward runs every
stage at its memory-bound speed of light EXCEPT stem+layer1 (66%,
PERF.md) — the stem's GroupNorm + ReLU + max-pool chain makes three
extra full-resolution passes over the [B, 320, 320, 64] conv output
(stats read, normalize read+write, pool read + quarter-size write).
This kernel collapses the *apply* side to a single read -> quarter-size
write: the per-(batch, channel) affine (scale, shift) is precomputed
from the GroupNorm statistics by one XLA reduction pass (reductions are
already at SoL there), and normalize+ReLU+pool happen in VMEM. Input
row windows of adjacent output tiles overlap by two rows, so the kernel
streams its window from HBM with an explicit async DMA instead of a
(disjoint) BlockSpec tiling.

The reference keeps these as separate torch ops (resnet stem,
/root/reference/src/models/backbone.py:159-174 via torchvision); there
is no reference kernel to port — this is TPU-native new scope.

Pool semantics match flax.linen.max_pool(window (3, 3), strides (2, 2),
padding ((1, 1), (1, 1))): because the pooled input is post-ReLU
(>= 0), clamping a window row/column to an in-range neighbour already
inside the window is exactly equivalent to -inf edge padding (a
duplicated in-window value never changes a max), which keeps the kernel
free of masks.
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


def _apply_pool_kernel(x_hbm, scale_ref, shift_ref, out_ref, xwin, sem, *,
                       toh: int, h: int, w: int):
    """One (batch, output-row-tile) grid step.

    Streams input rows [s, s + L) of batch element b into VMEM (L =
    2*toh + 2, s = clip(2*r0 - 1, 0, H - L)), then normalize + ReLU +
    3x3/s2 max-pool into the [1, toh, W/2, C] output block.
    """
    bi = pl.program_id(0)
    r0 = pl.program_id(1) * toh
    L = 2 * toh + 2
    s = jnp.clip(2 * r0 - 1, 0, h - L)
    d = 2 * r0 - 1 - s                     # window row 0 offset in tile

    dma = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(s, L)], xwin, sem)
    dma.start()
    dma.wait()

    scale = scale_ref[pl.ds(bi, 1)]        # [1, C] f32
    shift = shift_ref[pl.ds(bi, 1)]
    y = jnp.maximum(xwin[...].astype(jnp.float32) * scale[None, :, :]
                    + shift[None, :, :], 0.0)              # [L, W, C]

    # Column max over {2w-1, 2w, 2w+1} (edge-clamped; see module note).
    y_left = jnp.concatenate([y[:, :1], y[:, :w - 1]], axis=1)
    z = jnp.maximum(jnp.maximum(y[:, 0:w:2], y[:, 1:w:2]),
                    y_left[:, 0:w:2])                      # [L, W/2, C]

    # Row max over {2j+d, 2j+d+1, 2j+d+2} in tile coordinates; duplicate
    # one row at each end so index 1 + d + k + 2j stays in range for
    # d in {-1 (top tile), 0, +1 (bottom tile)} — the duplicates are
    # only ever read where the true window row coincides with them.
    zsafe = jnp.concatenate([z[:1], z, z[-1:]], axis=0)    # [L+2, W/2, C]
    rows = []
    for k in range(3):
        rk = jax.lax.dynamic_slice_in_dim(zsafe, 1 + d + k, 2 * toh,
                                          axis=0)
        rows.append(rk[0::2])                              # [toh, W/2, C]
    out = jnp.maximum(jnp.maximum(rows[0], rows[1]), rows[2])
    out_ref[0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("num_groups", "eps", "toh", "interpret"))
def groupnorm_relu_maxpool(x: Array, gamma: Array, beta: Array,
                           num_groups: int = 32, eps: float = 1e-5,
                           toh: int = 20, interpret: bool = False) -> Array:
    """GroupNorm -> ReLU -> max_pool(3x3, s2, pad (1, 1)) fused.

    x: [B, H, W, C] with H % (2*toh) == 0 and W even. Returns
    [B, H/2, W/2, C] in x.dtype.
    """
    b, h, w, c = x.shape
    assert h % (2 * toh) == 0 and w % 2 == 0, (h, w, toh)
    scale, shift = gn_scale_shift(x, gamma, beta, num_groups, eps)
    L = 2 * toh + 2

    return pl.pallas_call(
        partial(_apply_pool_kernel, toh=toh, h=h, w=w),
        grid=(b, h // (2 * toh)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),         # scale [B, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),         # shift [B, C]
        ],
        out_specs=pl.BlockSpec((1, toh, w // 2, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, scale, shift)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_relu_maxpool_trainable(x: Array, gamma: Array, beta: Array,
                                     num_groups: int = 32, eps: float = 1e-5,
                                     toh: int = 20) -> Array:
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
