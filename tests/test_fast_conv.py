"""fast_dw (ops/fast_conv): the hand-written im2col dw backward must be
bit-identical to XLA autodiff at the op and the model level."""

import numpy as np

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.ops.fast_conv import conv3_same_fast
from plastic_unet_tpu.ops.losses import bce_logits

SIZE = 16


def _ref_conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn) + b


def test_op_forward_and_grads_exact(rng):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k1, (2, 13, 11, 8))
    w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.1
    b = jax.random.normal(k3, (16,)) * 0.1
    ct = jax.random.normal(k4, (2, 13, 11, 16))

    np.testing.assert_array_equal(
        np.asarray(conv3_same_fast(x, w, b)), np.asarray(_ref_conv(x, w, b))
    )
    g_fast = jax.grad(lambda *a: jnp.sum(conv3_same_fast(*a) * ct), argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(lambda *a: jnp.sum(_ref_conv(*a) * ct), argnums=(0, 1, 2))(x, w, b)
    # dx and db are op-for-op identical; dw differs only in fp32 summation
    # order (one batched matmul vs conv accumulation)
    np.testing.assert_array_equal(np.asarray(g_fast[0]), np.asarray(g_ref[0]), err_msg="x")
    np.testing.assert_array_equal(np.asarray(g_fast[2]), np.asarray(g_ref[2]), err_msg="b")
    scale = float(jnp.abs(g_ref[1]).max())
    np.testing.assert_allclose(np.asarray(g_fast[1]), np.asarray(g_ref[1]), atol=1e-5 * scale, err_msg="w")


def test_model_fast_dw_params_and_grads(rng):
    ref = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    fast = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE, fast_dw=True)
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    y = jnp.asarray((rng.random((1, SIZE, SIZE)) > 0.5).astype(np.float32))
    h = ref.initial_zero_hebb(1)
    p0 = ref.init(jax.random.PRNGKey(0), x, h)["params"]
    p1 = fast.init(jax.random.PRNGKey(0), x, h)["params"]
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(p0)[0], jax.tree_util.tree_flatten_with_path(p1)[0]
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))

    def loss(m, p):
        return bce_logits(m.apply({"params": p}, x, h).activ, y)

    g0 = jax.grad(lambda p: loss(ref, p))(p0)
    g1 = jax.grad(lambda p: loss(fast, p))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-7)
