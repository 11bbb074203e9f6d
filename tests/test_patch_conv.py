"""patch_conv (ops/patch_conv): the im2col-forward 3x3 conv must match the
XLA conv in forward and all autodiff gradients (matmul-vs-conv accumulation
order is the only allowed difference), and the model flag must keep the
param tree byte-identical."""

import numpy as np

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.ops.losses import bce_logits
from plastic_unet_tpu.ops.patch_conv import conv3_same_patches

SIZE = 16


def _ref_conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn) + b


def test_op_forward_and_grads(rng):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k1, (2, 13, 11, 8))
    w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.1
    b = jax.random.normal(k3, (16,)) * 0.1
    ct = jax.random.normal(k4, (2, 13, 11, 16))

    got = np.asarray(conv3_same_patches(x, w, b))
    ref = np.asarray(_ref_conv(x, w, b))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())

    g_p = jax.grad(lambda *a: jnp.sum(conv3_same_patches(*a) * ct), argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(lambda *a: jnp.sum(_ref_conv(*a) * ct), argnums=(0, 1, 2))(x, w, b)
    for name, a, c in zip("xwb", g_r, g_p):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5 * scale, err_msg=name)


def test_model_patch_conv_params_and_grads(rng):
    ref = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    patch = UNetPRes(
        n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE, patch_conv=4
    )
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    y = jnp.asarray((rng.random((1, SIZE, SIZE)) > 0.5).astype(np.float32))
    h = ref.initial_zero_hebb(1)
    p0 = ref.init(jax.random.PRNGKey(0), x, h)["params"]
    p1 = patch.init(jax.random.PRNGKey(0), x, h)["params"]
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(p0)[0], jax.tree_util.tree_flatten_with_path(p1)[0]
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))

    def loss(m, p):
        return bce_logits(m.apply({"params": p}, x, h).activ, y)

    l0 = float(loss(ref, p0))
    l1 = float(loss(patch, p0))
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    g0 = jax.grad(lambda p: loss(ref, p))(p0)
    g1 = jax.grad(lambda p: loss(patch, p))(p0)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g0)[0], jax.tree.leaves(g1)):
        scale = max(float(jnp.abs(a).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale, err_msg=str(path)
        )


def test_model_patch_conv_all_levels(rng):
    """patch_conv large enough to cover every level still matches."""
    ref = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    patch = UNetPRes(
        n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE, patch_conv=10_000
    )
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    h = ref.initial_zero_hebb(1)
    p0 = ref.init(jax.random.PRNGKey(0), x, h)["params"]
    o0 = ref.apply({"params": p0}, x, h)
    o1 = patch.apply({"params": p0}, x, h)
    np.testing.assert_allclose(
        np.asarray(o1.activ), np.asarray(o0.activ), atol=1e-4 * float(jnp.abs(o0.activ).max())
    )


def test_patch_conv_training_trajectory_matches_plain(rng):
    """8-step B=1 lifetime scan: patch_conv model must track the plain-XLA
    model step for step (fp32 accumulation-order differences only), so it is
    parity-safe to enable in the benched training config."""
    import optax

    from plastic_unet_tpu.train.loop import TrainState, make_epoch_fn
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    steps = 8
    plain = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    patch = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE, patch_conv=32)
    X = jnp.asarray(rng.standard_normal((steps, 1, SIZE, SIZE, 1)).astype(np.float32) * 0.5)
    Y = jnp.asarray((rng.random((steps, 1, SIZE, SIZE)) > 0.5).astype(np.float32))
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    p0 = plain.init(jax.random.PRNGKey(0), X[0], plain.initial_zero_hebb(1))["params"]

    def run(model):
        state = TrainState(params=p0, opt_state=tx.init(p0),
                           hebb=model.initial_zero_hebb(1), step=jnp.zeros((), jnp.int32))
        return make_epoch_fn(model, tx, donate=False)(state, X, Y, jax.random.PRNGKey(1))

    s0, l0 = run(plain)
    s1, l1 = run(patch)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=5e-6)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_tap_conv_op(rng):
    from plastic_unet_tpu.ops.patch_conv import conv3_same_taps

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(5), 4)
    x = jax.random.normal(k1, (2, 9, 7, 8))
    w = jax.random.normal(k2, (3, 3, 8, 16)) * 0.1
    b = jax.random.normal(k3, (16,)) * 0.1
    ct = jax.random.normal(k4, (2, 9, 7, 16))
    got = np.asarray(conv3_same_taps(x, w, b))
    ref = np.asarray(_ref_conv(x, w, b))
    np.testing.assert_allclose(got, ref, atol=1e-5 * np.abs(ref).max())
    g_t = jax.grad(lambda *a: jnp.sum(conv3_same_taps(*a) * ct), argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(lambda *a: jnp.sum(_ref_conv(*a) * ct), argnums=(0, 1, 2))(x, w, b)
    for name, a, c in zip("xwb", g_r, g_t):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5 * scale, err_msg=name)


def test_convT_patches_op(rng):
    """Phase-decomposed ConvTranspose (kept as a measured-negative opt-in,
    PATCH_CONVT) must stay exact vs flax ConvTranspose."""
    from flax import linen as nn

    from plastic_unet_tpu.ops.patch_conv import convT3_s2_valid_patches

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 5, 4))
    m = nn.ConvTranspose(3, (3, 3), strides=(2, 2), padding="VALID", transpose_kernel=True)
    v = m.init(jax.random.PRNGKey(1), x)
    ref = m.apply(v, x)
    k, b = v["params"]["kernel"], v["params"]["bias"]
    got = convT3_s2_valid_patches(x, k, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    ct = jax.random.normal(jax.random.PRNGKey(2), ref.shape)
    g_r = jax.grad(lambda x, k, b: jnp.sum(m.apply({"params": {"kernel": k, "bias": b}}, x) * ct),
                   argnums=(0, 1, 2))(x, k, b)
    g_p = jax.grad(lambda x, k, b: jnp.sum(convT3_s2_valid_patches(x, k, b) * ct),
                   argnums=(0, 1, 2))(x, k, b)
    for name, a, c in zip("xkb", g_r, g_p):
        scale = max(float(jnp.abs(a).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=1e-5 * scale, err_msg=name)


def test_model_tap_wide_matches_plain(rng, monkeypatch):
    """Force the tap form onto every non-patched conv level and check the
    model still matches plain XLA (the production gate only fires at
    Cin>=64 / >=40px, which these small test shapes never reach)."""
    from plastic_unet_tpu.ops import patch_conv as pc

    monkeypatch.setattr(pc, "TAP_WIDE", True)
    monkeypatch.setattr(pc, "worth_taps", lambda h, w, cin, max_c, batch=1: True)
    ref = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    tap = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE, patch_conv=1)
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    h = ref.initial_zero_hebb(1)
    p0 = ref.init(jax.random.PRNGKey(0), x, h)["params"]
    p1 = tap.init(jax.random.PRNGKey(0), x, h)["params"]
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o0 = ref.apply({"params": p0}, x, h)
    o1 = tap.apply({"params": p0}, x, h)
    np.testing.assert_allclose(
        np.asarray(o1.activ), np.asarray(o0.activ), atol=1e-4 * float(jnp.abs(o0.activ).max())
    )


def test_patch_gate_disabled_at_batch(rng):
    """The patch/tap forms are a B=1 backward fix; at batch>1 they are pure
    HBM overhead (measured -8% at 8 lanes, -76% at 128 — PERF.md round 3),
    so a patch_conv model at batch>1 must compute the EXACT plain-conv
    graph (bit-identical outputs, since the same XLA conv runs)."""
    from plastic_unet_tpu.ops.patch_conv import worth_patching, worth_taps

    assert worth_patching(16, 16, 2, 32, batch=1)
    assert not worth_patching(16, 16, 2, 32, batch=2)
    assert not worth_taps(50, 50, 64, 32, batch=8)

    ref = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    patch = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE, patch_conv=4)
    x = jnp.asarray(rng.standard_normal((3, SIZE, SIZE, 1)).astype(np.float32))
    h = ref.initial_zero_hebb(3)
    p0 = ref.init(jax.random.PRNGKey(0), x[:1], h[:1])["params"]
    o_ref = ref.apply({"params": p0}, x, h)
    o_patch = patch.apply({"params": p0}, x, h)
    np.testing.assert_array_equal(np.asarray(o_ref.activout), np.asarray(o_patch.activout))


def test_model_patch_conv_bf16_matches_plain_bf16():
    """bf16 throughput mode: patch_conv with compute_dtype=bfloat16 must
    compute the same function as the plain bf16 conv stack to bf16-rounding
    tolerance (round-3 extension; fp32 remains the parity configuration).
    Local fixed seed: bf16 accumulation-order deltas vary with the draw, so
    the shared session rng would make the tolerance order-dependent."""
    rng = np.random.default_rng(1234)
    plain = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0,
                     nbf=SIZE, compute_dtype=jnp.bfloat16)
    patch = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0,
                     nbf=SIZE, compute_dtype=jnp.bfloat16, patch_conv=4)
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    y = jnp.asarray((rng.random((1, SIZE, SIZE)) > 0.5).astype(np.float32))
    h = plain.initial_zero_hebb(1)
    p0 = plain.init(jax.random.PRNGKey(0), x, h)["params"]
    p1 = patch.init(jax.random.PRNGKey(0), x, h)["params"]
    # identical param trees (fp32 params either way)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(p0)[0], jax.tree_util.tree_flatten_with_path(p1)[0]
    ):
        assert ka == kb and a.dtype == b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))

    def loss(m, p):
        return bce_logits(m.apply({"params": p}, x, h).activ, y)

    l_plain = float(loss(plain, p0))
    l_patch = float(loss(patch, p0))
    # bf16 accumulation-order tolerance (the two forms sum taps differently)
    np.testing.assert_allclose(l_patch, l_plain, rtol=3e-2)
    g0 = jax.grad(lambda p: loss(plain, p))(p0)
    g1 = jax.grad(lambda p: loss(patch, p))(p0)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g0)[0], jax.tree.leaves(g1)):
        # floor the scale at 1e-5: leaves whose whole gradient is bf16
        # noise-level (~1e-6 biases) would otherwise demand absolute
        # agreement finer than bf16 can represent
        scale = max(float(jnp.abs(a).max()), 1e-5)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=6e-2 * scale, err_msg=str(path)
        )
