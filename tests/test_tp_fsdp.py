"""Tensor-parallel / FSDP sharded training step.

Validates the multi-axis mesh path (parallel/mesh.py partition rules +
training.shard_train_state) on the virtual 8-device CPU mesh: the TP/FSDP
step must produce the same loss and parameters as the pure-DP step — the
sharding annotations change only the layout, XLA's collectives do the rest
(SURVEY.md §2.7: reference has DP only, train.py:73-74; TP/FSDP are
new first-class scope).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from oetr_tpu.config import BackboneConfig, NeckConfig, OETRConfig, TrainConfig
from oetr_tpu.parallel import (OETR_PARTITION_RULES, make_mesh,
                               param_shardings, shard_batch)
from oetr_tpu.training import (create_train_state, make_train_step,
                               shard_train_state)

pytestmark = pytest.mark.slow


def tiny_setup(batch=8, hw=48):
    model_cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(8, 8)),
    )
    train_cfg = TrainConfig(batch_size=batch, image_size=(hw, hw))
    model, state, tx = create_train_state(
        model_cfg, train_cfg, jax.random.key(0), image_hw=(hw, hw))
    rng = np.random.default_rng(7)
    batch_d = {
        "image1": jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 3)),
                              jnp.float32),
        "image2": jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 3)),
                              jnp.float32),
        "overlap_box1": jnp.tile(jnp.array([4.0, 4.0, 40.0, 40.0]),
                                 (batch, 1)),
        "overlap_box2": jnp.tile(jnp.array([8.0, 8.0, 36.0, 36.0]),
                                 (batch, 1)),
        "overlap_valid": jnp.ones((batch,), bool),
    }
    return model, state, tx, batch_d


def test_partition_rules_hit_transformer():
    mesh = make_mesh({"data": 2, "model": 2, "fsdp": 2})
    model, state, tx, _ = tiny_setup()
    sh = param_shardings(state.params, mesh, OETR_PARTITION_RULES,
                         fsdp_axis="fsdp")
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
             for path, s in flat}
    qproj = [v for k, v in specs.items() if k.endswith("q_proj/kernel")]
    merge = [v for k, v in specs.items() if k.endswith("merge/kernel")]
    assert qproj and all(s == P(None, "model") for s in qproj)
    assert merge and all(s == P("model", None) for s in merge)
    # Something outside the rules must be FSDP-sharded, not replicated.
    backbone = [v for k, v in specs.items()
                if "backbone" in k and k.endswith("kernel")]
    assert any(any(a == "fsdp" for a in s) for s in backbone)


def _sgd_state(model, state):
    """Swap adamw for SGD: its update is linear in the gradient, so tiny
    cross-layout reduction-order differences stay tiny in the params
    (adam's m/sqrt(v) at step 1 amplifies ~1e-7 grad noise arbitrarily)."""
    import optax
    tx = optax.sgd(0.1)
    from oetr_tpu.training import TrainState
    return tx, TrainState(step=state.step, params=state.params,
                          opt_state=tx.init(state.params))


@pytest.mark.parametrize("axes", [
    {"data": 2, "model": 2, "fsdp": 2},
    {"data": 4, "model": 2},
])
def test_tp_fsdp_matches_dp(axes):
    n = int(np.prod(list(axes.values())))
    model, state0, _, batch = tiny_setup(batch=8)
    tx, state = _sgd_state(model, state0)

    # Pure-DP reference step.
    mesh_dp = make_mesh({"data": n})
    step_dp = make_train_step(model, tx, mesh=mesh_dp)
    st_dp, m_dp = step_dp(state, shard_batch(batch, mesh_dp),
                          jax.random.key(1))

    mesh = make_mesh(axes)
    model2, state2, _, _ = tiny_setup(batch=8)
    tx2, state2 = _sgd_state(model2, state2)
    state2, state_sh = shard_train_state(
        state2, mesh, fsdp_axis="fsdp" if "fsdp" in axes else None)
    step = make_train_step(model2, tx2, mesh=mesh, state_shardings=state_sh)
    st_tp, m_tp = step(state2, shard_batch(batch, mesh), jax.random.key(1))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=2e-4)
    p_dp = jax.tree.leaves(st_dp.params)
    p_tp = jax.tree.leaves(st_tp.params)
    for a, b in zip(p_dp, p_tp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
