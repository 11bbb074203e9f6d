"""Pallas flat-conv kernels vs XLA convs (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.pallas_conv import (
    conv3x3_flat,
    flatten_hw,
    flip_weights,
    pack_weights,
    unflatten_hw,
)


def _xla_conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers((1,) + x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x[None], w, (1, 1), "SAME", dimension_numbers=dn)[0] + b


@pytest.mark.parametrize("hw,cin,cout", [(13, 16, 16), (25, 8, 16), (101, 16, 16), (12, 32, 8)])
def test_conv3x3_flat_matches_xla(hw, cin, cout, rng):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(hw + cin), 3)
    x = jax.random.normal(k1, (hw, hw, cin))
    w = jax.random.normal(k2, (3, 3, cin, cout)) * 0.1
    b = jax.random.normal(k3, (cout,)) * 0.1
    ref = _xla_conv(x, w, b)
    got = unflatten_hw(conv3x3_flat(flatten_hw(x), pack_weights(w), b, hw, hw), hw, hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_conv3x3_flat_relu(rng):
    hw, c = 17, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (hw, hw, c))
    w = jax.random.normal(k2, (3, 3, c, c)) * 0.1
    b = jnp.zeros((c,))
    ref = jnp.maximum(_xla_conv(x, w, b), 0.0)
    got = unflatten_hw(conv3x3_flat(flatten_hw(x), pack_weights(w), b, hw, hw, relu=True), hw, hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_flip_weights_is_input_gradient_kernel(rng):
    """conv SAME stride-1: d/dx <g, conv(x, w)> == conv(g, flip(w))."""
    hw, c = 15, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(k1, (hw, hw, c))
    w = jax.random.normal(k2, (3, 3, c, c)) * 0.1
    g = jax.random.normal(k3, (hw, hw, c))
    b = jnp.zeros((c,))

    _, vjp = jax.vjp(lambda x_: _xla_conv(x_, w, b), x)
    (dx_ref,) = vjp(g)
    dx = unflatten_hw(
        conv3x3_flat(flatten_hw(g), pack_weights(flip_weights(w)), jnp.zeros((c,)), hw, hw),
        hw, hw,
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)


def test_pad_rows_do_not_leak(rng):
    """Garbage in the padded rows of the flat input must not affect output."""
    hw, c = 9, 8  # 81 rows -> padded to 88
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(k1, (hw, hw, c))
    w = jax.random.normal(k2, (3, 3, c, c)) * 0.1
    b = jnp.zeros((c,))
    x2 = flatten_hw(x)
    x2_garbage = x2.at[hw * hw :].set(1e6)
    a = conv3x3_flat(x2, pack_weights(w), b, hw, hw)[: hw * hw]
    bb = conv3x3_flat(x2_garbage, pack_weights(w), b, hw, hw)[: hw * hw]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
