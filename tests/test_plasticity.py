"""Plasticity rules vs hand-computed numpy and torch expressions mirroring
the reference head (src/unet/unet_p_res.py:115-134)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops import (
    PlasticParams,
    bce_logits,
    bce_probs,
    hebb_update,
    init_plastic_params,
    initial_zero_hebb,
    oja_update,
    plastic_head,
    plastic_head_logits,
)

NBF = 13


def _setup(rng):
    w = rng.standard_normal((NBF, NBF)).astype(np.float32) * 0.01
    alpha = rng.random((NBF, NBF)).astype(np.float32) * 0.01
    eta = np.array([0.01], dtype=np.float32)
    activin = rng.standard_normal((NBF, NBF)).astype(np.float32)
    hebb = rng.standard_normal((NBF, NBF)).astype(np.float32) * 0.1
    return PlasticParams(jnp.asarray(w), jnp.asarray(alpha), jnp.asarray(eta)), activin, hebb


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_head_free_hebb_vs_numpy(rng):
    params, activin, hebb = _setup(rng)
    out, new_hebb = plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb), rule="hebb", alfa_type="free")

    eff = np.asarray(params.w) + np.asarray(params.alpha) * hebb
    expected_out = _sigmoid(activin.astype(np.float64) @ eff.astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), expected_out, atol=1e-4)

    # hebb rule: rank-1 update from ROW 0 (the bmm[...][0] quirk, unet_p_res.py:128)
    eta = float(params.eta[0])
    expected_hebb = (1 - eta) * hebb + eta * np.outer(activin[0], np.asarray(out)[0])
    np.testing.assert_allclose(np.asarray(new_hebb), expected_hebb, atol=1e-4)


def test_head_oja_vs_numpy(rng):
    params, activin, hebb = _setup(rng)
    out, new_hebb = plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb), rule="oja")
    eta = float(params.eta[0])
    yin = activin[0][:, None]
    yout = np.asarray(out)[0][None, :]
    expected = hebb + eta * (yin - hebb * yout) * yout
    np.testing.assert_allclose(np.asarray(new_hebb), expected, atol=1e-4)


def test_head_matches_torch_expressions(rng):
    """Mirror the exact torch expressions from the reference to pin the
    rank-1 row-0 semantics of both rules."""
    torch = pytest.importorskip("torch")
    params, activin, hebb = _setup(rng)

    t_in = torch.from_numpy(activin)
    t_hebb = torch.from_numpy(hebb)
    t_w = torch.from_numpy(np.asarray(params.w))
    t_alpha = torch.from_numpy(np.asarray(params.alpha))
    t_eta = torch.from_numpy(np.asarray(params.eta))

    activ = t_in.mm(t_w + torch.mul(t_alpha, t_hebb))
    activout = torch.sigmoid(activ)
    hebb_t = (1 - t_eta) * t_hebb + t_eta * torch.bmm(t_in.unsqueeze(2), activout.unsqueeze(1))[0]
    oja_t = t_hebb + t_eta * torch.mul(
        (t_in[0].unsqueeze(1) - torch.mul(t_hebb, activout[0].unsqueeze(0))), activout[0].unsqueeze(0)
    )

    out, new_hebb = plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb), rule="hebb")
    np.testing.assert_allclose(np.asarray(out), activout.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_hebb), hebb_t.numpy(), atol=1e-6)

    _, new_oja = plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb), rule="oja")
    np.testing.assert_allclose(np.asarray(new_oja), oja_t.numpy(), atol=1e-6)


def test_yoked_alpha(rng):
    params, activin, hebb = _setup(rng)
    scalar = PlasticParams(params.w, jnp.float32(0.005), params.eta)
    out, _ = plastic_head(scalar, jnp.asarray(activin), jnp.asarray(hebb), alfa_type="yoked")
    eff = np.asarray(params.w) + 0.005 * hebb
    np.testing.assert_allclose(np.asarray(out), _sigmoid(activin @ eff), atol=1e-4)


def test_logits_variant_consistent(rng):
    params, activin, hebb = _setup(rng)
    out, new_hebb = plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb))
    logits, out2, new_hebb2 = plastic_head_logits(params, jnp.asarray(activin), jnp.asarray(hebb))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=0)
    np.testing.assert_allclose(np.asarray(new_hebb), np.asarray(new_hebb2), atol=0)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)), np.asarray(out), atol=1e-7)


def test_invalid_args(rng):
    params, activin, hebb = _setup(rng)
    with pytest.raises(ValueError):
        plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb), rule="nope")
    with pytest.raises(ValueError):
        plastic_head(params, jnp.asarray(activin), jnp.asarray(hebb), alfa_type="nope")


def test_init_distributions():
    params = init_plastic_params(jax.random.PRNGKey(0), 101)
    assert params.w.shape == (101, 101)
    assert params.alpha.shape == (101, 101)
    assert float(params.eta[0]) == pytest.approx(0.01)
    # w ~ .01*randn, alpha ~ .01*rand
    assert abs(float(jnp.std(params.w)) - 0.01) < 0.002
    assert float(jnp.min(params.alpha)) >= 0.0
    assert float(jnp.max(params.alpha)) <= 0.01
    assert float(jnp.mean(initial_zero_hebb(101))) == 0.0


def test_eta_gets_zero_gradient(rng):
    """eta never enters the loss path (hebb trace detached per sample) ->
    zero gradient, preserved reference behavior (SURVEY.md §2.1)."""
    params, activin, hebb = _setup(rng)
    target = jnp.asarray((rng.random((NBF, NBF)) > 0.5).astype(np.float32))

    def loss_fn(p):
        logits, _, _ = plastic_head_logits(p, jnp.asarray(activin), jnp.asarray(hebb))
        return bce_logits(logits, target)

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads.eta).max()) == 0.0
    assert float(jnp.abs(grads.w).max()) > 0.0
    assert float(jnp.abs(grads.alpha).max()) > 0.0


def test_bce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal(1000).astype(np.float32)
    probs = _sigmoid(logits).astype(np.float32)
    y = (rng.random(1000) > 0.5).astype(np.float32)
    expected = torch.nn.BCELoss()(torch.from_numpy(probs), torch.from_numpy(y)).item()
    assert float(bce_probs(jnp.asarray(probs), jnp.asarray(y))) == pytest.approx(expected, abs=1e-6)
    assert float(bce_logits(jnp.asarray(logits), jnp.asarray(y))) == pytest.approx(expected, abs=1e-5)
