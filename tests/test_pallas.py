"""Fused Pallas plastic head vs the pure-XLA reference implementation —
forward values, gradients (incl. autograd-through-the-update), and in-model
use. Runs in Pallas interpreter mode on the CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops import PlasticParams, plastic_head_logits
from plastic_unet_tpu.ops.losses import bce_logits
from plastic_unet_tpu.ops.pallas_plastic import fused_plastic_head, plastic_head_pallas_batched

NBF = 101  # deliberately non-128-aligned to exercise the padding path


def _setup(rng, nbf=NBF):
    w = (rng.standard_normal((nbf, nbf)) * 0.01).astype(np.float32)
    alpha = (rng.random((nbf, nbf)) * 0.01).astype(np.float32)
    eta = np.array([0.01], dtype=np.float32)
    x = rng.standard_normal((nbf, nbf)).astype(np.float32)
    hebb = (rng.standard_normal((nbf, nbf)) * 0.1).astype(np.float32)
    return tuple(map(jnp.asarray, (x, w, alpha, eta, hebb)))


@pytest.mark.parametrize("rule", ["hebb", "oja"])
def test_forward_matches_xla(rule, rng):
    x, w, alpha, eta, hebb = _setup(rng)
    a1, y1, h1 = fused_plastic_head(x, w, alpha, eta, hebb, rule, "free")
    params = PlasticParams(w=w, alpha=alpha, eta=eta)
    a2, y2, h2 = plastic_head_logits(params, x, hebb, rule=rule)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_forward_aligned_128(rng):
    x, w, alpha, eta, hebb = _setup(rng, nbf=128)
    a1, y1, h1 = fused_plastic_head(x, w, alpha, eta, hebb, "hebb", "free")
    params = PlasticParams(w=w, alpha=alpha, eta=eta)
    a2, y2, h2 = plastic_head_logits(params, x, hebb)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


@pytest.mark.parametrize("rule", ["hebb", "oja"])
def test_gradients_match_autograd(rule, rng):
    """Grads through the fused op (loss on logits AND on the new trace) must
    equal autograd through the XLA head."""
    x, w, alpha, eta, hebb = _setup(rng, nbf=32)
    tgt = jnp.asarray((rng.random((32, 32)) > 0.5).astype(np.float32))

    def loss_fused(x, w, alpha, eta, hebb):
        a, y, h = fused_plastic_head(x, w, alpha, eta, hebb, rule, "free")
        return bce_logits(a, tgt) + 0.1 * jnp.sum(h**2)

    def loss_xla(x, w, alpha, eta, hebb):
        params = PlasticParams(w=w, alpha=alpha, eta=eta)
        a, y, h = plastic_head_logits(params, x, hebb, rule=rule)
        return bce_logits(a, tgt) + 0.1 * jnp.sum(h**2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, alpha, eta, hebb)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w, alpha, eta, hebb)
    for a, b, name in zip(g1, g2, ["x", "w", "alpha", "eta", "hebb"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name)
    assert float(jnp.abs(g1[3]).max()) > 0  # eta DOES get grad via the trace term here


def test_batched_matches_vmap_xla(rng):
    x = jnp.asarray(rng.standard_normal((3, NBF, NBF)).astype(np.float32))
    h = jnp.asarray((rng.standard_normal((3, NBF, NBF)) * 0.1).astype(np.float32))
    _, w, alpha, eta, _ = _setup(rng)
    params = PlasticParams(w=w, alpha=alpha, eta=eta)
    a1, y1, h1 = plastic_head_pallas_batched(params, x, h, rule="hebb")
    a2, y2, h2 = jax.vmap(lambda a, hh: plastic_head_logits(params, a, hh))(x, h)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_yoked_alpha(rng):
    x, w, _, eta, hebb = _setup(rng, nbf=32)
    alpha_scalar = jnp.float32(0.005)
    a1, y1, h1 = fused_plastic_head(x, w, alpha_scalar, eta, hebb, "hebb", "yoked")
    params = PlasticParams(w=w, alpha=alpha_scalar, eta=eta)
    a2, y2, h2 = plastic_head_logits(params, x, hebb, alfa_type="yoked")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_model_with_pallas_head_matches(rng):
    """UNetPRes(use_pallas=True) must equal the XLA-head model."""
    from plastic_unet_tpu.models import UNetPRes

    m_x = UNetPRes(nbf=32, neurons=2, use_pallas=False)
    m_p = UNetPRes(nbf=32, neurons=2, use_pallas=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)).astype(np.float32))
    hebb = m_x.initial_zero_hebb(1)
    vs = m_x.init(jax.random.PRNGKey(0), x, hebb)
    o1 = m_x.apply(vs, x, hebb)
    o2 = m_p.apply(vs, x, hebb)
    np.testing.assert_allclose(np.asarray(o2.activout), np.asarray(o1.activout), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o2.hebb), np.asarray(o1.hebb), atol=1e-6)


def test_large_nbf_padding_path(rng):
    """nbf=150 pads to 256 lanes — exercises a non-trivial pad amount."""
    x, w, alpha, eta, hebb = _setup(rng, nbf=150)
    a1, y1, h1 = fused_plastic_head(x, w, alpha, eta, hebb, "oja", "free")
    params = PlasticParams(w=w, alpha=alpha, eta=eta)
    a2, y2, h2 = plastic_head_logits(params, x, hebb, rule="oja")
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
