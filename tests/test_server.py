"""Serving API: load-from-.pth, warm prediction, RLE output."""

import numpy as np
import pytest

import jax

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.ops.rle import rle_decode
from plastic_unet_tpu.submit.server import MaskPredictor

SIZE = 32


def _params():
    model = UNetPRes(nbf=SIZE, neurons=2)
    import jax.numpy as jnp

    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1))
    return model, vs["params"]


def test_predict_shapes(rng):
    model, params = _params()
    pred = MaskPredictor(model, params, chunk=4).warmup()
    out = pred.predict(rng.standard_normal((6, SIZE, SIZE)).astype(np.float32))
    assert out.shape == (6, SIZE, SIZE)
    assert out.min() >= 0 and out.max() <= 1


def test_predict_threshold_and_rle(rng):
    model, params = _params()
    pred = MaskPredictor(model, params, chunk=4, threshold=0.5)
    imgs = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    masks = pred.predict(imgs)
    assert masks.dtype == bool
    rles = pred.predict_rle(imgs)
    for rle, m in zip(rles, masks):
        np.testing.assert_array_equal(rle_decode(rle, (SIZE, SIZE)), m.astype(np.uint8))


def test_from_pth(tmp_path, rng):
    pytest.importorskip("torch")
    from plastic_unet_tpu.utils.torch_interop import flax_params_to_state_dict, save_pth, unetp_res_name_map

    model, params = _params()
    p = str(tmp_path / "m.pth")
    save_pth(flax_params_to_state_dict(params, unetp_res_name_map()), p)
    pred = MaskPredictor.from_pth(p, nbf=SIZE, neurons=2, chunk=4)
    imgs = rng.standard_normal((2, SIZE, SIZE)).astype(np.float32)
    np.testing.assert_allclose(
        pred.predict(imgs), MaskPredictor(model, params, chunk=4).predict(imgs), atol=1e-6
    )


def test_tta_predictor(rng):
    model, params = _params()
    pred = MaskPredictor(model, params, chunk=4, tta=("identity", "hflip"))
    out = pred.predict(rng.standard_normal((2, SIZE, SIZE)).astype(np.float32))
    assert out.shape == (2, SIZE, SIZE)


def test_threshold_f64_exact(monkeypatch, rng):
    """The live server binarizes with the same f64-exact compare as
    submit.inference.predict and exported artifacts: a pixel equal to
    np.float32(0.3) classifies as 1 (0.3's round-nearest f32 is ABOVE the
    true 0.3, so a plain f32 `> 0.3` compare would call it 0)."""
    import importlib

    # attribute access resolves to the re-exported inference() function, not
    # the submodule — go through importlib for the module object
    inf = importlib.import_module("plastic_unet_tpu.submit.inference")

    model, params = _params()
    boundary = np.float32(0.3)
    fixed = np.full((2, SIZE, SIZE), 0.1, np.float32)
    fixed[0] = boundary
    monkeypatch.setattr(inf, "predict_masks_tta", lambda *a, **k: fixed)

    pred = MaskPredictor(model, params, threshold=0.3)
    out = pred.predict(np.zeros((2, SIZE, SIZE), np.float32))
    assert out.dtype == bool
    assert out[0].all()  # p == f32(0.3) > threshold under f64 semantics
    assert not out[1].any()
    # predict_rle's explicit-threshold path uses the same compare
    rles = pred.predict_rle(np.zeros((2, SIZE, SIZE), np.float32), threshold=0.3)
    assert rles[0] == f"1 {SIZE * SIZE}" and rles[1] == ""
