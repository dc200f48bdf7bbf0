"""Training runtime: optimizer, sharded train step, checkpointing.

Replaces the reference's DDP loop (/root/reference/train.py:45-194) with a
jit-compiled functional step over a `jax.sharding.Mesh`: batches sharded
along the data axis, parameters replicated (or FSDP-sharded), gradient
all-reduce inserted by XLA from the sharding annotations — no explicit
NCCL calls. Optimizer parity: AdamW lr 1e-4 + MultiStepLR [15, 30] x 0.1
(train.py:75-78). Checkpoints carry the FULL train state (params +
optimizer + step) via orbax, fixing the reference's no-resume gap
(SURVEY.md §5, train.py:192-194 saves weights only).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OETRConfig, TrainConfig
from ..models.oetr import OETR, build_oetr
from .losses import oetr_losses, total_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def multistep_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """MultiStepLR semantics (ref: train.py:76-78): lr * gamma^k after each
    milestone epoch."""
    boundaries = {m * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1):
    sched = multistep_schedule(cfg, steps_per_epoch)
    return optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)


def create_train_state(model_cfg: OETRConfig, train_cfg: TrainConfig,
                       rng: jax.Array, image_hw: tuple[int, int],
                       steps_per_epoch: int = 1):
    """Initialize model params + optimizer state."""
    model = build_oetr(model_cfg)
    h, w = image_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jit: a single XLA compile instead of per-primitive eager dispatch
    # (the axon TPU remote-compile path costs ~1s per op).
    params = jax.jit(model.init)(rng, dummy, dummy)
    tx = make_optimizer(train_cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return model, TrainState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=opt_state), tx


def loss_fn(model: OETR, params, batch: dict, dropout_rng, cycle: bool,
            oiou: bool, full_cycle: bool = False,
            aux_match_weight: float = 0.0, aux_match_stride: int = 32,
            heatmap_weight: float = 0.0, size_weight: float = 0.0,
            reweight_power: float = 0.0):
    """Forward + loss on one (sharded) batch.

    batch keys: image1/image2 [B,H,W,3], overlap_box1/2 [B,4],
    overlap_valid [B] bool, optional mask1/mask2 (feature-res validity).
    ``full_cycle`` adds the depth-warped CycleOverlapLoss (needs K1/K2,
    depth1/depth2, pose1/pose2, crop1/crop2, ratio1/ratio2 in the batch —
    ref: src/losses/losses.py:246-520, enabled by LOSS.CYCLE_OVERLAP).
    ``size_weight`` adds the direct FCOS-style tlbr supervision and
    ``reweight_power`` > 0 scales per-pair losses by scale difficulty
    (losses.size_loss / difficulty_weights — the round-4 anti-hedging
    levers).
    """
    h1, w1 = batch["image1"].shape[1:3]
    h2, w2 = batch["image2"].shape[1:3]
    out = model.apply(params, batch["image1"], batch["image2"],
                      batch.get("mask1"), batch.get("mask2"),
                      deterministic=False, with_cycle=cycle,
                      rngs={"dropout": dropout_rng})
    wts = None
    if reweight_power > 0.0:
        from .losses import difficulty_weights
        wts = difficulty_weights(batch["overlap_box1"],
                                 batch["overlap_box2"], (h1, w1), (h2, w2),
                                 power=reweight_power)
    losses = oetr_losses(out, batch["overlap_box1"], batch["overlap_box2"],
                         batch["overlap_valid"], (h1, w1), (h2, w2),
                         oiou=oiou, weights=wts)
    if size_weight > 0.0:
        from .losses import size_loss
        losses["size_loss"] = size_weight * size_loss(
            out, batch["overlap_box1"], batch["overlap_box2"],
            batch["overlap_valid"], (h1, w1), (h2, w2), weights=wts)
    if full_cycle:
        from .losses import cycle_overlap_loss
        losses["cycle_overlap_loss"] = cycle_overlap_loss(
            out["pred_bbox1"], out["pred_bbox2"],
            batch["K1"], batch["depth1"], batch["pose1"],
            batch["crop1"], batch["ratio1"],
            batch["K2"], batch["depth2"], batch["pose2"],
            batch["crop2"], batch["ratio2"], batch["overlap_valid"])
    if aux_match_weight > 0.0:
        # Coarse-correspondence InfoNCE on encoder tokens: direct
        # cross-scale matching supervision (needs geometry batch keys;
        # see losses.aux_match_loss). Without it a from-scratch backbone
        # never learns scale_diff>2 matching from box losses alone.
        from .losses import aux_match_loss
        losses["aux_match_loss"] = aux_match_weight * aux_match_loss(
            out, batch, aux_match_stride)
    if heatmap_weight > 0.0:
        # Dense heatmap supervision: the soft-argmax center L1 alone
        # admits a uniform-heatmap/hedged-box optimum (losses.py:
        # heatmap_ce_loss docstring).
        from .losses import heatmap_ce_loss
        losses["heatmap_loss"] = heatmap_weight * (
            heatmap_ce_loss(out["prob_map1"], batch["overlap_box1"],
                            batch["overlap_valid"], (h1, w1), weights=wts)
            + heatmap_ce_loss(out["prob_map2"], batch["overlap_box2"],
                              batch["overlap_valid"], (h2, w2),
                              weights=wts)) / 2.0
    return total_loss(losses), losses


def make_train_step(model: OETR, tx, mesh: Mesh | None = None,
                    data_axis: str = "data", cycle: bool = False,
                    oiou: bool = False, state_shardings=None,
                    full_cycle: bool = False,
                    aux_match_weight: float = 0.0,
                    aux_match_stride: int = 32,
                    heatmap_weight: float = 0.0,
                    size_weight: float = 0.0,
                    reweight_power: float = 0.0):
    """Build the jitted train step.

    With a mesh, inputs get NamedSharding constraints: batch split on the
    data axis, params/opt state replicated — XLA turns the gradient sum
    into a psum over ICI (replacing DDP's bucket all-reduce,
    train.py:73-74).

    ``state_shardings`` (a TrainState pytree of NamedShardings, e.g. from
    :func:`shard_train_state`) switches pure-DP replication to real
    tensor-parallel/FSDP layouts: Megatron column/row splits on the
    transformer (parallel.OETR_PARTITION_RULES) and ZeRO-style parameter
    sharding for the rest; XLA inserts the all-gathers/reduce-scatters.
    """
    def step_fn(state: TrainState, batch: dict, dropout_rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch, dropout_rng, cycle, oiou,
                              full_cycle, aux_match_weight,
                              aux_match_stride, heatmap_weight,
                              size_weight, reweight_power),
            has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=new_opt), metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(data_axis))
    state_sh = state_shardings if state_shardings is not None else repl
    # Prefix pytrees: state shardings per-leaf (or replicated), every batch
    # leaf sharded on its leading (batch) dim, rng key replicated.
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def shard_train_state(state: TrainState, mesh: Mesh, rules=None,
                      fsdp_axis: str | None = None):
    """(sharded_state, sharding_pytree) for TP/FSDP training.

    Params and adam mu/nu get per-leaf NamedShardings from the partition
    rules (parallel/mesh.py); scalar counters/step replicate. The returned
    sharding pytree plugs straight into ``make_train_step(...,
    state_shardings=...)``.
    """
    from ..parallel.mesh import param_shardings

    shardings = TrainState(
        step=NamedSharding(mesh, P()),
        params=param_shardings(state.params, mesh, rules, fsdp_axis),
        opt_state=param_shardings(state.opt_state, mesh, rules, fsdp_axis),
    )
    sharded = jax.tree.map(jax.device_put, state, shardings,
                           is_leaf=lambda x: x is None)
    return sharded, shardings


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int | None = None):
    """Orbax full-state checkpoint (params + optimizer + step)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    step = int(state.step) if step is None else step
    ckptr.save(f"{ckpt_dir}/step_{step}", jax.tree.map(jnp.asarray, state))
    ckptr.wait_until_finished()


def load_checkpoint(ckpt_dir: str, step: int, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(f"{ckpt_dir}/step_{step}", target)


def latest_checkpoint_step(ckpt_dir: str) -> int | None:
    """Largest step_N under ckpt_dir, or None (drives the CLI --resume)."""
    import os
    try:
        steps = [int(d.removeprefix("step_")) for d in os.listdir(ckpt_dir)
                 if d.startswith("step_")
                 and d.removeprefix("step_").isdigit()]
    except FileNotFoundError:
        return None
    return max(steps, default=None)
