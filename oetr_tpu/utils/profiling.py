"""Profiling: jax.profiler traces + roofline accounting.

The reference has no profiler integration (SURVEY.md §5 — only an
unwired AverageTimer); here every hot path can be traced to TensorBoard
and kernels get speed-of-light estimates against v5e peak numbers.
"""
from __future__ import annotations

import contextlib
import time

import jax

# v5e per-chip peaks (public spec).
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def speed_of_light(flops: float, bytes_accessed: float,
                   peak_flops: float = V5E_BF16_FLOPS,
                   peak_bw: float = V5E_HBM_BYTES_PER_S) -> dict:
    """Roofline minimum time + bound classification for one kernel."""
    t_compute = flops / peak_flops
    t_memory = bytes_accessed / peak_bw
    return {
        "t_compute_s": t_compute,
        "t_memory_s": t_memory,
        "t_sol_s": max(t_compute, t_memory),
        "bound": "compute" if t_compute >= t_memory else "memory",
        "arithmetic_intensity": flops / max(bytes_accessed, 1.0),
    }


def benchmark(fn, *args, iters: int = 20, warmup: int = 2) -> dict:
    """Steady-state wall time of a jitted callable (block_until_ready)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_s": 1.0 / dt}


def device_memory_stats(device=None) -> dict:
    """Per-device HBM usage (ref analogue: get_gpu_memory,
    src/utils/utils.py:68-73). Returns {} on backends without stats."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    out = {}
    if "bytes_in_use" in stats:
        out["bytes_in_use"] = int(stats["bytes_in_use"])
    if "bytes_limit" in stats:
        out["bytes_limit"] = int(stats["bytes_limit"])
        if "bytes_in_use" in out:
            out["utilization"] = out["bytes_in_use"] / max(
                out["bytes_limit"], 1)
    return out


class ScalarWriter:
    """Tiny TensorBoard scalar logger (ref analogue: loss_info,
    src/utils/utils.py:179-188). Uses torch.utils.tensorboard when
    available; otherwise falls back to a JSONL file."""

    def __init__(self, logdir: str):
        import os
        os.makedirs(logdir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(logdir)
            self._fh = None
        except Exception:
            import json
            self._tb = None
            self._fh = open(f"{logdir}/scalars.jsonl", "a")
            self._json = json

    def write(self, step: int, scalars: dict) -> None:
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        else:
            self._fh.write(self._json.dumps(
                {"step": int(step), **{k: float(v)
                                       for k, v in scalars.items()}}) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        else:
            self._fh.close()
