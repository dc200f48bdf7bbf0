"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference has no pipeline story (its only parallelism is DDP,
/root/reference/train.py:73-74); this is new TPU-native scope completing
the parallelism inventory (SURVEY.md §2.7): DP ('data'), TP ('model'),
FSDP ('fsdp'), SP (ring attention) — and PP here.

Design: the classic single-controller JAX pipeline. Stage parameters are
stacked along a leading stage axis and sharded ``P('pipe')`` so each
device holds exactly one stage; microbatches enter at stage 0, activations
move to the next stage each tick via ``lax.ppermute``, and the last stage
accumulates outputs. The whole schedule is a ``lax.scan`` over
``M + S - 1`` ticks inside one ``shard_map``, so it is a single compiled
XLA program — differentiable end-to-end (scan + ppermute both have
transposes), usable for pipelined training, and the ppermutes ride ICI.
Per-microbatch constants (validity masks, positional encodings) are not
circulated: device ``i`` at tick ``t`` is working on microbatch
``t - i``, so each stage indexes its replicated aux locally.

The OETR transformer encoder is the natural pipeline target: its
``num_layers`` alternating (self, cross) stages have identical parameter
shapes, so they stack directly (``stack_encoder_stages``), and the
image-pair streams fuse into one doubled batch where cross-attention's
source is a half-batch roll (``make_encoder_stage``) — exactly the
sequential semantics of models/transformer.py:219-228.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = jnp.ndarray


def gpipe(stage_fn: Callable, stacked_params: Any, microbatches: Any,
          mesh: Mesh, axis: str = "pipe", aux: Any = None) -> Any:
    """Run ``microbatches`` through a pipeline of identical stages.

    Args:
      stage_fn: ``(params_one_stage, x, aux_m) -> y`` with ``y`` shaped
        like ``x`` (the circulating activation pytree).
      stacked_params: pytree whose leaves have a leading stage dim of
        size ``mesh.shape[axis]``; stage ``i`` runs on device ``i`` of
        the pipe axis.
      microbatches: pytree of float arrays with leading dim ``M`` (the
        microbatch count); leaf ``[m]`` is microbatch ``m``'s input.
      aux: optional pytree with leading dim ``M`` of per-microbatch
        constants (masks, positional encodings, labels). Replicated on
        every stage and indexed locally — never sent over the ring, and
        free to be bool.
      mesh, axis: the mesh and the pipeline axis name.

    Returns the outputs, same structure/leading-``M`` as
    ``microbatches``, replicated across the pipe axis. Differentiable
    (GPipe schedule: all activations live for the backward pass).

    Memory note: microbatch inputs and outputs are replicated across the
    pipe axis (``P()`` in/out specs) and each tick psums the full output
    tree, so per-device activation memory and collective volume scale
    with the *whole* batch — correct and simple (this powers the
    equivalence tests and dryrun), but it forfeits the per-stage memory
    scaling full pipeline training would want; a production variant would
    shard microbatch storage and gather outputs on the last stage only.
    """
    n_stages = mesh.shape[axis]
    lead = jax.tree.leaves(stacked_params)[0].shape[0]
    if lead != n_stages:
        # Without this, shard_map would happily split L = k*S stages into
        # chunks and `p[0]` would silently drop all but one per device.
        raise ValueError(
            f"stacked_params leading dim {lead} != mesh.shape[{axis!r}] "
            f"{n_stages}: exactly one stage per pipe device is required")
    n_micro = jax.tree.leaves(microbatches)[0].shape[0]
    n_ticks = n_micro + n_stages - 1
    have_aux = aux is not None

    def run(params, mbs, aux_r):
        stage = jax.tree.map(lambda p: p[0], params)  # this device's stage
        idx = lax.axis_index(axis)
        state = jax.tree.map(lambda x: jnp.zeros_like(x[0]), mbs)
        outputs = jax.tree.map(jnp.zeros_like, mbs)

        def tick(carry, t):
            state, outputs = carry
            feed = jnp.clip(t, 0, n_micro - 1)
            # Stage 0 ingests microbatch t; everyone else consumes the
            # activation ppermuted from the previous stage.
            inp = jax.tree.map(
                lambda xs, s: jnp.where(
                    idx == 0, lax.dynamic_index_in_dim(xs, feed, 0, False), s),
                mbs, state)
            # Device idx is processing microbatch t - idx at tick t.
            mine = jnp.clip(t - idx, 0, n_micro - 1)
            aux_m = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, mine, 0, False), aux_r)
            out = stage_fn(stage, inp, aux_m) if have_aux else \
                stage_fn(stage, inp)
            # The last stage finished microbatch t-(S-1) this tick.
            done = t - (n_stages - 1)
            slot = jnp.clip(done, 0, n_micro - 1)
            write = jnp.logical_and(idx == n_stages - 1, done >= 0)

            def commit(acc, y):
                cur = lax.dynamic_index_in_dim(acc, slot, 0, False)
                return lax.dynamic_update_index_in_dim(
                    acc, jnp.where(write, y, cur), slot, 0)

            outputs = jax.tree.map(commit, outputs, out)
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
            state = jax.tree.map(
                lambda y: lax.ppermute(y, axis, perm), out)
            return (state, outputs), None

        (_, outputs), _ = lax.scan(tick, (state, outputs),
                                   jnp.arange(n_ticks))
        # Outputs are populated only on the last stage; replicate them.
        return jax.tree.map(
            lambda o: lax.psum(
                jnp.where(idx == n_stages - 1, o, jnp.zeros_like(o)), axis),
            outputs)

    aux = aux if have_aux else ()
    repl = lambda tree: jax.tree.map(lambda _: P(), tree)
    return shard_map(run, mesh=mesh,
                     in_specs=(jax.tree.map(lambda _: P(axis), stacked_params),
                               repl(microbatches), repl(aux)),
                     out_specs=repl(microbatches),
                     check_vma=False)(stacked_params, microbatches, aux)


# ---------------------------------------------------------------------------
# OETR encoder as a pipeline
# ---------------------------------------------------------------------------

def stack_encoder_stages(transformer_params: dict, num_layers: int) -> dict:
    """Stack ``enc_self_i``/``enc_cross_i`` param subtrees along a stage axis.

    ``transformer_params`` is the QueryTransformer param dict (keys
    ``enc_self_0`` … ``enc_cross_{L-1}``, models/transformer.py:219-228);
    all layers share shapes, so leaves stack to ``[L, ...]``.
    """
    selfs = [transformer_params[f"enc_self_{i}"] for i in range(num_layers)]
    crosses = [transformer_params[f"enc_cross_{i}"] for i in range(num_layers)]
    return {
        "self": jax.tree.map(lambda *xs: jnp.stack(xs), *selfs),
        "cross": jax.tree.map(lambda *xs: jnp.stack(xs), *crosses),
    }


def make_encoder_stage(d_model: int, nhead: int, attention: str = "linear",
                       dtype: Any = jnp.float32) -> Callable:
    """Stage fn: one (self, cross) encoder layer pair on a doubled batch.

    The activation is ``x = concat([feat0, feat1])`` ([2b, N, C]); aux is
    ``(mask, pos)`` stacked the same way. Self-attention is batch-local;
    cross-attention's source is the other image, i.e. a half-batch roll —
    identical math to the sequential four calls in
    models/transformer.py:224-228 (src captured post-self, pre-cross,
    for both streams).
    """
    from ..models.transformer import EncoderLayer

    layer = EncoderLayer(d_model, nhead, attention, dtype)

    def stage(params, x, aux):
        mask, pos = aux
        half = x.shape[0] // 2
        x = layer.apply({"params": params["self"]}, x, x, mask, mask,
                        pos, pos)
        src = jnp.roll(x, half, axis=0)
        src_mask = jnp.roll(mask, half, axis=0)
        src_pos = jnp.roll(pos, half, axis=0)
        x = layer.apply({"params": params["cross"]}, x, src, mask, src_mask,
                        pos, src_pos)
        return x

    return stage


def pipelined_encoder(transformer_params: dict, feat0: Array, feat1: Array,
                      pos0: Array, pos1: Array, mesh: Mesh, *,
                      mask0: Array | None = None, mask1: Array | None = None,
                      num_layers: int = 4, nhead: int = 8,
                      attention: str = "linear", axis: str = "pipe",
                      n_micro: int | None = None,
                      dtype: Any = jnp.float32) -> tuple[Array, Array]:
    """Pipelined equivalent of QueryTransformer's encoder stack.

    Requires ``mesh.shape[axis] == num_layers`` (one (self, cross) pair
    per stage) and batch divisible by ``n_micro``. Returns
    ``(feat0, feat1)`` contextualized, numerically equal to the
    sequential encoder (pinned by tests/test_pipeline_parallel.py).
    """
    b, n, c = feat0.shape
    assert mesh.shape[axis] == num_layers, (mesh.shape, num_layers)
    n_micro = n_micro if n_micro is not None else mesh.shape[axis]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro

    def to_mb(a0, a1):
        # [M, 2*mb, ...]: microbatch m carries rows m*mb:(m+1)*mb of both
        # images, image-0 half first.
        a0 = a0.reshape(n_micro, mb, *a0.shape[1:])
        a1 = a1.reshape(n_micro, mb, *a1.shape[1:])
        return jnp.concatenate([a0, a1], axis=1)

    x = to_mb(feat0, feat1)
    pos = to_mb(jnp.broadcast_to(pos0, feat0.shape),
                jnp.broadcast_to(pos1, feat1.shape))
    if mask0 is None:
        mask = jnp.ones((n_micro, 2 * mb, n), bool)
    else:
        mask = to_mb(mask0, mask1)

    stacked = stack_encoder_stages(transformer_params, num_layers)
    stage = make_encoder_stage(c, nhead, attention, dtype)
    out = gpipe(stage, stacked, x, mesh, axis, aux=(mask, pos))
    out = out.reshape(n_micro, 2, mb, n, c)
    f0 = out[:, 0].reshape(b, n, c)
    f1 = out[:, 1].reshape(b, n, c)
    return f0, f1
