"""Shape/behavior tests for the three model families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import CoordConvUNet, UNetP, UNetPRes
from plastic_unet_tpu.ops.coords import add_coords


def test_unetp_res_shapes_101():
    m = UNetPRes(nbf=101)
    x = jnp.zeros((2, 101, 101, 1))
    vs = m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(2))
    out = m.apply(vs, x, m.initial_zero_hebb(2))
    assert out.activout.shape == (2, 101, 101)
    assert out.hebb.shape == (2, 101, 101)
    assert out.activ.shape == (2, 101, 101)
    assert float(jnp.min(out.activout)) >= 0.0 and float(jnp.max(out.activout)) <= 1.0


def test_unetp_res_shapes_128():
    m = UNetPRes(nbf=128, neurons=8)
    x = jnp.zeros((1, 128, 128, 1))
    vs = m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(1))
    out = m.apply(vs, x, m.initial_zero_hebb(1))
    assert out.activout.shape == (1, 128, 128)


def test_unetp_shapes_128():
    m = UNetP(nbf=128)
    x = jnp.zeros((1, 128, 128, 1))
    vs = m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(1))
    out = m.apply(vs, x, m.initial_zero_hebb(1))
    assert out.activout.shape == (1, 128, 128)


def test_unetp_bilinear_upsample():
    m = UNetP(nbf=128, bilinear_upsample=True)
    x = jnp.zeros((1, 128, 128, 1))
    vs = m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(1))
    out = m.apply(vs, x, m.initial_zero_hebb(1))
    assert out.activout.shape == (1, 128, 128)


def test_bilinear_matches_torch_align_corners(rng):
    torch = pytest.importorskip("torch")
    from plastic_unet_tpu.models.blocks import bilinear_upsample_2x_align_corners

    x = rng.standard_normal((1, 7, 9, 3)).astype(np.float32)
    got = np.asarray(bilinear_upsample_2x_align_corners(jnp.asarray(x)))
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
    want = up(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-5)


def test_unetp_geometry_error_at_101():
    """UNetP at 101 px produces a 96x96 map that cannot view to (101,101) —
    the reference fails the same way (SURVEY.md §2.1)."""
    m = UNetP(nbf=101)
    x = jnp.zeros((1, 101, 101, 1))
    with pytest.raises(ValueError, match="divisible by 16"):
        m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(1))


def test_coord_conv_unet():
    m = CoordConvUNet()
    x = jnp.zeros((2, 128, 128, 1))
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)
    assert out.shape == (2, 128, 128, 1)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0


def test_add_coords_matches_keras_semantics():
    """xx varies along width, yy along height, both in [-1, 1]
    (coord_conv_script.py:74-90); with_r adds the radius channel."""
    x = jnp.zeros((1, 4, 4, 1))
    out = add_coords(x, with_r=False)
    assert out.shape == (1, 4, 4, 3)
    xx, yy = np.asarray(out[0, :, :, 1]), np.asarray(out[0, :, :, 2])
    np.testing.assert_allclose(xx[0], np.array([-1, -1 / 3, 1 / 3, 1]), atol=1e-6)
    np.testing.assert_allclose(xx[1], xx[0])  # constant along height
    np.testing.assert_allclose(yy[:, 0], np.array([-1, -1 / 3, 1 / 3, 1]), atol=1e-6)
    out_r = add_coords(x, with_r=True)
    assert out_r.shape == (1, 4, 4, 4)
    r = np.asarray(out_r[0, :, :, 3])
    np.testing.assert_allclose(r, np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2), atol=1e-6)


def test_dropout_active_in_train_mode():
    m = UNetPRes(nbf=101, dropout_ratio=0.5)
    x = jnp.ones((1, 101, 101, 1))
    vs = m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(1))
    out_det = m.apply(vs, x, m.initial_zero_hebb(1), train=False)
    out_tr = m.apply(vs, x, m.initial_zero_hebb(1), train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(out_det.activout), np.asarray(out_tr.activout))
    # deterministic under same rng
    out_tr2 = m.apply(vs, x, m.initial_zero_hebb(1), train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_tr.activout), np.asarray(out_tr2.activout))


def test_vanilla_mode():
    """plastic=False: sigmoid on trunk logits, trace passthrough, no w/alpha
    params (BASELINE.json config #1)."""
    m = UNetPRes(nbf=32, neurons=2, plastic=False)
    x = jnp.ones((1, 32, 32, 1))
    h = jnp.full((1, 32, 32), 0.5)
    vs = m.init(jax.random.PRNGKey(0), x, h)
    assert "w" not in vs["params"] and "alpha" not in vs["params"]
    out = m.apply(vs, x, h)
    np.testing.assert_array_equal(np.asarray(out.hebb), np.asarray(h))
    np.testing.assert_allclose(
        np.asarray(out.activout), 1 / (1 + np.exp(-np.asarray(out.activ))), atol=1e-6
    )


def test_coord_conv_injection_mode():
    """coord_conv=True: stem consumes n_channels+2 inputs (BASELINE config #4)."""
    m = UNetPRes(nbf=32, neurons=2, coord_conv=True)
    x = jnp.ones((1, 32, 32, 1))
    vs = m.init(jax.random.PRNGKey(0), x, m.initial_zero_hebb(1))
    k = vs["params"]["DownRes_0"]["Conv_0"]["kernel"]
    assert k.shape == (3, 3, 3, 2)  # in = 1 + 2 coord channels
    out = m.apply(vs, x, m.initial_zero_hebb(1))
    assert out.activout.shape == (1, 32, 32)
