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


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    all_res = []
    # OETR flagship: stride-32 tokens at 640^2 -> 20x20=400/image.
    all_res += bench_shape(16, 400, 400, 8, 32, jnp.bfloat16)
    # Larger map (832^2 crop canvas at stride 32 -> 26x26=676).
    all_res += bench_shape(16, 676, 676, 8, 32, jnp.bfloat16)
    # Decoder regime: 1 query against the token memory.
    all_res += bench_shape(16, 400, 400, 8, 32, jnp.float32)
    bad = [r for r in all_res if r["max_rel_diff"] > 2e-2]
    if bad:
        print(f"MISMATCH: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
