"""overlap_ab_demo.py end-to-end at toy scale: segment training with
--skip_eval + checkpoint resume + final A/B table — the restart-loop
contract the TPU runs rely on (the tunneled backend leaks host memory,
so long trainings restart every ~1000 steps)."""
import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "overlap_ab_demo.py")


@pytest.mark.slow
def test_ab_demo_segmented_resume(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "AXON_LOOPBACK_RELAY"):
        env.pop(var, None)
    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    base = [sys.executable, SCRIPT, "--batch", "2", "--train_pairs", "4",
            "--val_pairs", "2", "--hw", "96", "--topk", "64",
            "--d_model", "32", "--layers", "1", "--dec_layers", "1",
            "--data_dir", data, "--ckpt_dir", ckpt]

    # Segment 1: train to step 2, save, no eval.
    r1 = subprocess.run(base + ["--steps", "2", "--skip_eval"],
                        capture_output=True, text=True, env=env, timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["metric"] == "overlap_ab_train_segment"
    assert out1["steps"] == 2
    assert os.path.isdir(os.path.join(ckpt, "step_2"))
    assert os.path.exists(os.path.join(data, "train", "pairs.txt"))

    # Segment 2: resume (dataset reused), train to 4, full eval.
    r2 = subprocess.run(base + ["--steps", "4"], capture_output=True,
                        text=True, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "# resumed from step 2" in r2.stderr
    assert "# reusing dataset" in r2.stderr
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["metric"] == "overlap_ab_pose_auc"
    for mode in ("direct", "oetr_guided", "gt_guided"):
        assert "auc@5" in out2[mode]
    assert os.path.isdir(os.path.join(ckpt, "step_4"))

    # Segment 3: resume at the target step — trains nothing, still
    # evaluates, must NOT crash on the existing checkpoint (ADVICE r2).
    r3 = subprocess.run(base + ["--steps", "4"], capture_output=True,
                        text=True, env=env, timeout=900)
    assert r3.returncode == 0, r3.stderr[-2000:]
    out3 = json.loads(r3.stdout.strip().splitlines()[-1])
    assert out3["train_loss_last"] is None   # NaN -> null (strict JSON)
