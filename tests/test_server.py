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
