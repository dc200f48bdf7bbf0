#!/usr/bin/env python
"""Multi-host dry run: 2 processes x 4 virtual CPU devices, one train step.

Validates the jax.distributed multi-host path (the replacement for the
reference's torch.distributed.launch + init_process_group,
/root/reference/train.py:60) without a TPU pod: each process exposes 4
virtual CPU devices, joins via ``initialize_distributed``, builds ONE
global ('data','model') mesh over all 8 devices with the data axis
crossing the process (DCN) boundary, contributes its local batch shard
through ``shard_batch_global``, and executes one sharded train step.

Launcher mode (default): spawns the 2 workers and checks both report a
finite, identical loss.
Worker mode (--worker N): runs inside each spawned process.
"""
from __future__ import annotations

import os
import subprocess
import sys

PORT = int(os.environ.get("MULTIHOST_DRYRUN_PORT", "12391"))
NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def worker(process_id: int) -> None:
    import jax
    import numpy as np

    from oetr_tpu.parallel import (initialize_distributed, make_global_mesh,
                                   shard_batch_global)
    initialize_distributed(coordinator=f"localhost:{PORT}",
                           num_processes=NUM_PROCESSES,
                           process_id=process_id)
    assert jax.process_count() == NUM_PROCESSES
    assert len(jax.devices()) == NUM_PROCESSES * DEVICES_PER_PROCESS

    from oetr_tpu.config import (BackboneConfig, NeckConfig, OETRConfig,
                                 TrainConfig)
    from oetr_tpu.training import (create_train_state, make_train_step,
                                   shard_train_state)

    # data axis (size 4) crosses the process boundary; model axis (2)
    # stays host-internal — DP over DCN, TP over ICI.
    mesh = make_global_mesh({"data": 4, "model": 2})

    model_cfg = OETRConfig(
        backbone=BackboneConfig(depth=18, stop_layer="layer3", last_layer=256),
        neck=NeckConfig(d_model=64, nhead=4, num_layers=1,
                        num_decoder_layers=1, max_shape=(8, 8)))
    train_cfg = TrainConfig(batch_size=8, image_size=(64, 64))
    model, state, tx = create_train_state(
        model_cfg, train_cfg, jax.random.key(0), image_hw=(64, 64))
    state, state_sh = shard_train_state(state, mesh, fsdp_axis=None)
    step = make_train_step(model, tx, mesh=mesh, cycle=True,
                           state_shardings=state_sh)

    # Global batch 8 = 2 processes x local 4; identical across runs
    # because the seed covers the GLOBAL batch, sliced per process.
    rng = np.random.default_rng(0)
    gb = 8
    lo = process_id * (gb // NUM_PROCESSES)
    hi = lo + gb // NUM_PROCESSES
    full = {
        "image1": rng.uniform(0, 1, (gb, 64, 64, 3)).astype(np.float32),
        "image2": rng.uniform(0, 1, (gb, 64, 64, 3)).astype(np.float32),
        "overlap_box1": np.tile(np.array([4., 4., 60., 60.], np.float32),
                                (gb, 1)),
        "overlap_box2": np.tile(np.array([8., 8., 56., 56.], np.float32),
                                (gb, 1)),
        "overlap_valid": np.ones((gb,), bool),
    }
    local = {k: v[lo:hi] for k, v in full.items()}
    batch = shard_batch_global(local, mesh)

    new_state, metrics = step(state, batch, jax.random.key(1))
    jax.block_until_ready(new_state.params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(f"multihost worker {process_id}: ok, loss={loss:.6f}", flush=True)


def launch() -> int:
    env = dict(os.environ)
    for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
              "AXON_LOOPBACK_RELAY", "AXON_POOL_SVC_OVERRIDE"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS}")
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(NUM_PROCESSES)]
    losses = []
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        sys.stdout.write(out)
        rc |= p.returncode
        for line in out.splitlines():
            if line.startswith("multihost worker"):
                losses.append(line.rsplit("loss=", 1)[1])
    if rc == 0 and len(set(losses)) == 1 and losses:
        print(f"multihost dryrun: ok ({NUM_PROCESSES} processes x "
              f"{DEVICES_PER_PROCESS} devices, loss={losses[0]})")
        return 0
    print(f"multihost dryrun: FAILED rc={rc} losses={losses}")
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        sys.exit(launch())
