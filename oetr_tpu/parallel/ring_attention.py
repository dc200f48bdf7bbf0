"""Ring attention: sequence-parallel exact softmax attention over a mesh.

The SP/CP story mandated by SURVEY.md §2.7: OETR's 'full' attention mode
at stride-16 on ~2000px inputs reaches ~15k tokens — too big for one
chip's VMEM-resident softmax. Here the K/V sequence is sharded over a
mesh axis; each step every device computes streaming-softmax partial
results for its local K/V block, then the blocks rotate one hop around
the ring via `jax.lax.ppermute` (ICI neighbor exchange). After
``axis_size`` steps every query has attended to every key exactly once —
numerically identical to full attention (online-softmax accumulation).

Head-sharding (Ulysses-style) is the cheaper alternative for the 8-head
blocks: shard the H axis of [B, L, H, D] with a plain NamedSharding and
XLA handles it with no collectives in the attention itself; this module
covers the case where the *sequence* must be split.
"""
from __future__ import annotations

from contextlib import contextmanager
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jnp.ndarray

# Trace-time context threading the (mesh, axis) pair into model code: the
# transformer's attention dispatch (models/transformer.py:_attend) reads
# this when ``attention='full:ring'`` so configs can request sequence
# parallelism without plumbing device topology through module attributes.
_RING_CTX: list[tuple[Mesh, str]] = []


@contextmanager
def ring_context(mesh: Mesh, axis: str = "seq"):
    """Make ``ring_attention`` reachable from model configs: any
    ``attention='full:ring'`` layer traced inside this context shards its
    K/V sequence over ``axis`` of ``mesh``."""
    _RING_CTX.append((mesh, axis))
    try:
        yield
    finally:
        _RING_CTX.pop()


def current_ring_context() -> tuple[Mesh, str] | None:
    return _RING_CTX[-1] if _RING_CTX else None


def _block_attend(q, k, v, acc, row_max, row_sum, kv_mask):
    """One streaming-softmax block update.

    q: [B, Lq, H, D]; k, v: [B, Lk, H, D]; acc: [B, Lq, H, D];
    row_max/row_sum: [B, Lq, H]; kv_mask: [B, Lk] float (1 valid).
    """
    temp = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("blhd,bshd->blsh", q, k) * temp     # [B, Lq, Lk, H]
    logits = jnp.where(kv_mask[:, None, :, None] > 0, logits, -jnp.inf)

    blk_max = jnp.max(logits, axis=2)                        # [B, Lq, H]
    new_max = jnp.maximum(row_max, blk_max)
    new_max_safe = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
    correction = jnp.exp(row_max - new_max_safe)
    correction = jnp.where(jnp.isfinite(row_max), correction, 0.0)

    p = jnp.exp(logits - new_max_safe[:, :, None, :])
    p = jnp.where(jnp.isfinite(logits), p, 0.0)
    blk_sum = jnp.sum(p, axis=2)
    acc = acc * correction[..., None] + jnp.einsum("blsh,bshd->blhd", p, v)
    row_sum = row_sum * correction + blk_sum
    return acc, new_max, row_sum


def ring_attention(q: Array, k: Array, v: Array, mesh: Mesh,
                   axis: str = "seq", kv_mask: Array | None = None) -> Array:
    """Exact softmax attention with K/V sharded along ``axis``.

    Args:
      q: [B, L, H, D] (replicated or locally relevant queries).
      k, v: [B, S, H, D] with S divisible by the axis size; sharded on S.
      kv_mask: optional [B, S] bool.
    Returns:
      [B, L, H, D] — attention over the FULL key set.
    """
    b, s = k.shape[0], k.shape[1]
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), jnp.float32)
    else:
        kv_mask = kv_mask.astype(jnp.float32)

    def local_fn(q, k_blk, v_blk, m_blk):
        n = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)

        acc = jnp.zeros(q.shape, jnp.float32)
        row_max = jnp.full(q.shape[:3], -jnp.inf)
        row_sum = jnp.zeros(q.shape[:3])

        def step(i, carry):
            acc, row_max, row_sum, k_blk, v_blk, m_blk = carry
            acc, row_max, row_sum = _block_attend(
                q.astype(jnp.float32), k_blk.astype(jnp.float32),
                v_blk.astype(jnp.float32), acc, row_max, row_sum, m_blk)
            # Rotate K/V one hop around the ring (skip after last use).
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            m_blk = jax.lax.ppermute(m_blk, axis, perm)
            return acc, row_max, row_sum, k_blk, v_blk, m_blk

        acc, row_max, row_sum, *_ = jax.lax.fori_loop(
            0, n, step, (acc, row_max, row_sum, k_blk, v_blk, m_blk))
        out = acc / jnp.maximum(row_sum[..., None], 1e-30)
        return out.astype(q.dtype)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(),
        check_vma=False)
    return fn(q, k, v, kv_mask)


def ulysses_attention(q: Array, k: Array, v: Array, mesh: Mesh,
                      axis: str = "seq",
                      kv_mask: Array | None = None) -> Array:
    """Ulysses-style sequence parallelism: all-to-all heads <-> sequence.

    The cheaper SP alternative for multi-head blocks (SURVEY.md §2.7):
    inputs arrive sequence-sharded along ``axis``; one all-to-all
    redistributes them head-sharded (each device holds H/n full-length
    heads), attention runs locally with NO communication, and a second
    all-to-all restores the sequence sharding. Two all-to-alls total vs
    the ring's n ppermute hops — wins when H >= axis size and the
    interconnect favors bulk transfers.

    Args:
      q: [B, L, H, D]; k, v: [B, S, H, D]; H divisible by the axis size.
      kv_mask: optional [B, S] bool.
    Returns [B, L, H, D] full softmax attention (XLA op semantics).
    """
    from ..ops.attention import full_attention

    b, s = k.shape[0], k.shape[1]
    n = mesh.shape[axis]
    if q.shape[2] % n != 0:
        raise ValueError(f"heads {q.shape[2]} not divisible by mesh axis "
                         f"{axis}={n}")
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), bool)

    def local_fn(q_blk, k_blk, v_blk, m):
        # [B, L/n, H, D] -> all-to-all -> [B, L, H/n, D]: split the head
        # axis across devices, concat the sequence axis.
        def seq_to_head(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        def head_to_seq(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        qh = seq_to_head(q_blk)
        kh = seq_to_head(k_blk)
        vh = seq_to_head(v_blk)
        # kv_mask is sequence-sharded [B, S/n]; gather the full length.
        m_full = jax.lax.all_gather(m, axis, axis=1, tiled=True)
        out = full_attention(qh, kh, vh, None, m_full)
        return head_to_seq(out)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False)
    return fn(q, k, v, kv_mask)
