"""Native C++ data service vs the Python image pipeline."""
import os
import time

import cv2
import numpy as np
import pytest

from oetr_tpu.data.images import prepare_image
from oetr_tpu.data.native import (decode_jpeg, load_native, native_available,
                                  prepare_batch_native)


def _time(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture
def jpeg_file(tmp_path, rng):
    img = (rng.uniform(0, 255, (30, 40, 3))).astype(np.uint8)
    img = cv2.resize(img, (320, 240), interpolation=cv2.INTER_NEAREST)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return path


def test_decode_matches_cv2(jpeg_file):
    data = open(jpeg_file, "rb").read()
    ours = decode_jpeg(data)
    ref = cv2.cvtColor(cv2.imread(jpeg_file), cv2.COLOR_BGR2RGB)
    assert ours.shape == ref.shape
    # Different IDCT implementations: allow small per-pixel deviation.
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 2.0, diff.mean()


def test_prepare_batch_matches_python(jpeg_file):
    out = prepare_batch_native([jpeg_file, jpeg_file], (256, 256), (64, 64),
                               resize_max=200)
    ref_img = cv2.cvtColor(cv2.imread(jpeg_file),
                           cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    ref = prepare_image(ref_img, (256, 256), (64, 64), resize_max=200)

    np.testing.assert_array_equal(out["valid_hw"][0], ref.valid_hw)
    np.testing.assert_allclose(out["oetr_scale"][0], ref.oetr_scale,
                               rtol=1e-5)
    np.testing.assert_allclose(out["scale_to_orig"][0], ref.scale_to_orig,
                               rtol=1e-5)
    # Pixels: bilinear-vs-INTER_AREA + jpeg decoder differences — compare
    # loosely on the valid region.
    h, w = ref.valid_hw
    a = out["canvas"][0, :h, :w]
    b = ref.canvas[:h, :w]
    assert np.abs(a - b).mean() < 0.03
    # Padding is exactly zero.
    assert np.all(out["canvas"][0, h:] == 0)


def test_batch_throughput(tmp_path, rng):
    """Threaded native loader should beat the serial python path."""
    paths = []
    for i in range(16):
        img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
        p = str(tmp_path / f"i{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)

    # Warm the page cache + library so both sides measure compute, not
    # first-touch disk reads.
    for p in paths:
        open(p, "rb").read()
    prepare_batch_native(paths, (640, 640), (320, 320), resize_max=None)

    t_native = min(_time(lambda: prepare_batch_native(
        paths, (640, 640), (320, 320), resize_max=None)) for _ in range(3))

    def python_pass():
        for p in paths:
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB
                               ).astype(np.float32) / 255.0
            prepare_image(img, (640, 640), (320, 320), resize_max=None)

    t_python = min(_time(python_pass) for _ in range(3))

    # Not a strict benchmark on shared hardware, but the threaded C++
    # path should not be slower than serial python+cv2.
    assert t_native < t_python * 1.5, (t_native, t_python)


def test_missing_file_reports_failure(tmp_path):
    with pytest.raises(RuntimeError):
        prepare_batch_native([str(tmp_path / "nope.jpg")], (64, 64), (32, 32))
