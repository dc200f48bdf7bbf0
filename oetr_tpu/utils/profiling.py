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
