#!/usr/bin/env python
"""Microbenchmark: Pallas fused attention vs the XLA reference path.

Runs on whatever backend is active (the real TPU chip under axon) at
OETR's flagship shapes — stride-32 tokens L=S=400, H=8, D=32, batch 16,
bf16 (the transformer's regime inside bench.py) — plus a couple of
larger shapes. Prints one JSON line per (kernel, shape) with both wall
times and the speedup, and exits nonzero if outputs disagree.

Uses the persistent compilation cache (shared with bench.py) so repeat
runs skip the remote compile.
"""
from __future__ import annotations

import json
import os
import sys
import time

os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
            exist_ok=True)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from oetr_tpu.ops.attention import full_attention, linear_attention  # noqa: E402
from oetr_tpu.ops.pallas_attention import (full_attention_pallas,  # noqa: E402
                                           linear_attention_pallas)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)          # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def bench_shape(b, l, s, h, d, dtype, mask_frac=1.0, iters=30):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, l, h, d)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dtype)
    qm = jnp.asarray(np.arange(l)[None, :] < int(l * mask_frac) +
                     np.zeros((b, 1)), bool)
    km = jnp.asarray(np.arange(s)[None, :] < int(s * mask_frac) +
                     np.zeros((b, 1)), bool)

    results = []
    for name, xla_fn, pl_fn in [
            ("linear", linear_attention, linear_attention_pallas),
            ("full", full_attention, full_attention_pallas)]:
        xla_jit = jax.jit(xla_fn)
        t_xla, o_xla = timeit(xla_jit, q, k, v, qm, km, iters=iters)
        t_pl, o_pl = timeit(pl_fn, q, k, v, qm, km, iters=iters)
        diff = float(jnp.max(jnp.abs(
            o_xla.astype(jnp.float32) - o_pl.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(o_xla.astype(jnp.float32)))) + 1e-9
        rec = {
            "kernel": name, "shape": [b, l, s, h, d], "dtype": str(dtype),
            "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pl * 1e6, 1),
            "speedup": round(t_xla / t_pl, 3),
            "max_rel_diff": round(diff / scale, 5),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


def bench_flash(b, l, s, h, d, dtype, iters=20):
    """Long-sequence regime: streaming flash kernel vs XLA full attention."""
    from oetr_tpu.ops.pallas_attention import flash_attention_pallas
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, l, h, d)), dtype)
    k = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dtype)
    v = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), dtype)
    t_xla, o_xla = timeit(jax.jit(full_attention), q, k, v, iters=iters)
    t_fl, o_fl = timeit(flash_attention_pallas, q, k, v, iters=iters)
    diff = float(jnp.max(jnp.abs(
        o_xla.astype(jnp.float32) - o_fl.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(o_xla.astype(jnp.float32)))) + 1e-9
    rec = {"kernel": "flash", "shape": [b, l, s, h, d], "dtype": str(dtype),
           "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_fl * 1e6, 1),
           "speedup": round(t_xla / t_fl, 3),
           "max_rel_diff": round(diff / scale, 5)}
    print(json.dumps(rec), flush=True)
    return [rec]


def bench_sinkhorn(b, m, n, iters_sk=20, iters=20):
    from oetr_tpu.ops.sinkhorn import log_optimal_transport
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(0, 1, (b, m, n)), jnp.float32)
    xla_fn = jax.jit(lambda s: log_optimal_transport(s, 0.7, iters_sk))
    pl_fn = jax.jit(lambda s: log_optimal_transport(s, 0.7, iters_sk,
                                                    use_pallas=True))
    t_xla, o_xla = timeit(xla_fn, scores, iters=iters)
    t_pl, o_pl = timeit(pl_fn, scores, iters=iters)
    diff = float(jnp.max(jnp.abs(o_xla - o_pl)))
    rec = {"kernel": "sinkhorn", "shape": [b, m, n, iters_sk],
           "dtype": "float32",
           "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pl * 1e6, 1),
           "speedup": round(t_xla / t_pl, 3), "max_rel_diff": round(diff, 5)}
    print(json.dumps(rec), flush=True)
    return [rec]


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    all_res = []
    if only in ("all", "attn"):
        # OETR flagship: stride-32 tokens at 640^2 -> 20x20=400/image.
        all_res += bench_shape(16, 400, 400, 8, 32, jnp.bfloat16)
        # Larger map (832^2 crop canvas at stride 32 -> 26x26=676).
        all_res += bench_shape(16, 676, 676, 8, 32, jnp.bfloat16)
        all_res += bench_shape(16, 400, 400, 8, 32, jnp.float32)
    if only in ("all", "flash"):
        # Stride-16 long-sequence regime (SP story): 4k and 10k tokens.
        all_res += bench_flash(4, 4096, 4096, 8, 32, jnp.bfloat16)
        all_res += bench_flash(1, 10240, 10240, 8, 32, jnp.bfloat16, iters=5)
    if only in ("all", "sinkhorn"):
        # SuperGlue regime: 1024 kpts + dustbin, 20 iterations.
        all_res += bench_sinkhorn(8, 1025, 1025, 20)
    bad = [r for r in all_res if r["max_rel_diff"] > 2e-2]
    if bad:
        print(f"MISMATCH: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
