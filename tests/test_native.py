"""Native C++ components vs the Python/golden implementations."""

import os

import numpy as np
import pytest

from plastic_unet_tpu.ops.iou import iou_metric_batch
from plastic_unet_tpu.ops.rle import encode

native = pytest.importorskip("plastic_unet_tpu.ops.native")

try:
    native.get_lib()
    HAVE_LIB = True
except OSError:
    HAVE_LIB = False

pytestmark = pytest.mark.skipif(not HAVE_LIB, reason="native library unavailable (no toolchain)")


def test_rle_batch_matches_python(rng):
    masks = (rng.random((16, 101, 101)) > 0.5).astype(np.uint8)
    masks[0] = 0
    masks[1] = 1
    got = native.rle_encode_batch_native(masks)
    want = [encode(m) for m in masks]
    assert got == want


def test_rle_batch_chunking(rng):
    masks = (rng.random((7, 13, 9)) > 0.3).astype(np.uint8)
    got = native.rle_encode_batch_native(masks, chunk=3)
    assert got == [encode(m) for m in masks]


def test_iou_sweep_matches_python(rng):
    y = (rng.random((10, 1, 101, 101)) > 0.6).astype(np.float32)
    preds = rng.random((10, 101, 101)).astype(np.float32)
    tori = np.linspace(0.3, 0.7, 31)
    thr = np.log(tori / (1 - tori)).astype(np.float32)
    got = native.iou_threshold_sweep_native(y, preds, thr)
    want = np.array([iou_metric_batch(y, preds > t) for t in thr])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_png_loader_matches_pil(tmp_path, rng):
    from PIL import Image

    from plastic_unet_tpu.data.images import load_image

    paths = []
    # 8-bit grayscale
    a8 = (rng.random((101, 101)) * 255).astype(np.uint8)
    p8 = str(tmp_path / "g8.png")
    Image.fromarray(a8).save(p8)
    paths.append(p8)
    # 16-bit grayscale (TGS masks are 16-bit)
    a16 = (rng.random((101, 101)) * 65535).astype(np.uint16)
    p16 = str(tmp_path / "g16.png")
    Image.fromarray(a16).save(p16)
    paths.append(p16)
    # RGB
    rgb = (rng.random((101, 101, 3)) * 255).astype(np.uint8)
    prgb = str(tmp_path / "rgb.png")
    Image.fromarray(rgb).save(prgb)
    paths.append(prgb)

    got = native.load_png_gray_batch_native(paths, 101, 101)
    for i, p in enumerate(paths):
        want = load_image(p, (101, 101))
        np.testing.assert_allclose(got[i], want, atol=1e-6, err_msg=p)


def test_png_loader_resize(tmp_path, rng):
    from PIL import Image

    from plastic_unet_tpu.data.images import load_image

    a = (rng.random((64, 48)) * 255).astype(np.uint8)
    p = str(tmp_path / "r.png")
    Image.fromarray(a).save(p)
    got = native.load_png_gray_batch_native([p], 101, 101)
    want = load_image(p, (101, 101))
    np.testing.assert_allclose(got[0], want, atol=1e-6)
