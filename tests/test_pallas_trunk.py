"""Fused residual-tail Pallas kernel vs the XLA block math — forward and
full VJP (input, all 4 kernels, all 4 biases) — in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.pallas_trunk import (
    big_bias,
    big_weights,
    geometry,
    pack_hw,
    residual_tail_apply,
    unpack_hw,
)


def _conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers((1,) + x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x[None], w, (1, 1), "SAME", dimension_numbers=dn)[0] + b


def residual_tail_xla(x0, p):
    """The two ResidualBlocks + final ReLU (reference unet_p_res.py:166-238),
    including the inplace-ReLU skip quirk (skip = relu(input))."""
    h1 = jax.nn.relu(x0)
    x1 = _conv(jax.nn.relu(_conv(h1, p["w11"], p["b11"])), p["w12"], p["b12"]) + h1
    h2 = jax.nn.relu(x1)
    x2 = _conv(jax.nn.relu(_conv(h2, p["w21"], p["b21"])), p["w22"], p["b22"]) + h2
    return jax.nn.relu(x2)


def _make(h, w, c, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    x0 = jax.random.normal(ks[0], (h, w, c))
    p = {}
    for i, name in enumerate(("11", "12", "21", "22")):
        p["w" + name] = jax.random.normal(ks[1 + 2 * i], (3, 3, c, c)) * (0.5 / (3 * np.sqrt(c)))
        p["b" + name] = jax.random.normal(ks[2 + 2 * i], (c,)) * 0.1
    return x0, p


SHAPES = [(13, 13, 16), (10, 11, 32), (7, 7, 64), (5, 5, 128), (4, 4, 256), (21, 19, 8)]


def test_pack_roundtrip():
    for h, w, c in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(1), (h, w, c))
        xp = pack_hw(x, h, w, c)
        p, pw, rp, l = geometry(h, w, c)
        assert xp.shape == (rp, l)
        np.testing.assert_array_equal(np.asarray(unpack_hw(xp, h, w, c)), np.asarray(x))


@pytest.mark.parametrize("h,w,c", SHAPES)
def test_tail_forward_matches_xla(h, w, c):
    x0, p = _make(h, w, c)
    ref = residual_tail_xla(x0, p)
    got = residual_tail_apply(x0, p, h, w, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("h,w,c", [(13, 13, 16), (10, 11, 32), (5, 5, 128), (4, 4, 256)])
def test_tail_vjp_matches_xla(h, w, c):
    x0, p = _make(h, w, c, seed=3)
    ct = jax.random.normal(jax.random.PRNGKey(9), (h, w, c))

    def loss_ref(x0, p):
        return jnp.sum(residual_tail_xla(x0, p) * ct)

    def loss_got(x0, p):
        return jnp.sum(residual_tail_apply(x0, p, h, w, c) * ct)

    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x0, p)
    gx_got, gp_got = jax.grad(loss_got, argnums=(0, 1))(x0, p)
    scale = max(float(jnp.abs(gx_ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref), atol=3e-5 * scale)
    for k in gp_ref:
        s = max(float(jnp.abs(gp_ref[k]).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(gp_got[k]), np.asarray(gp_ref[k]), atol=3e-5 * s, err_msg=k
        )


def test_tail_forward_101px():
    """Flagship geometry (101x101, C=16, P=8, PW=104)."""
    h = w = 101
    x0, p = _make(h, w, 16, seed=5)
    ref = residual_tail_xla(x0, p)
    got = residual_tail_apply(x0, p, h, w, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
