"""bce_probs at saturated probabilities: finite, torch-exact gradients.

Regression test for the NaN found in the round-2 quality showdown: the
autodiff of the clamped-log BCE produced 0 * inf = NaN gradients once the
sigmoid saturated to exactly 0/1 in fp32; torch's backward clamps the
denominator ((p-y)/max(p(1-p), 1e-12)) and never NaNs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.losses import bce_logits, bce_probs

torch = pytest.importorskip("torch")


def test_saturated_probs_gradient_finite_and_torch_exact():
    p = jnp.array([0.0, 1.0, 0.5, 1e-20, 1.0 - 1e-7, 0.3])
    y = jnp.array([1.0, 0.0, 1.0, 0.0, 1.0, 0.0])

    loss, g = jax.value_and_grad(bce_probs)(p, y)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g)))

    tp = torch.tensor(np.asarray(p), requires_grad=True)
    ty = torch.tensor(np.asarray(y))
    tl = torch.nn.BCELoss()(tp, ty)
    tl.backward()
    np.testing.assert_allclose(float(loss), tl.item(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g), tp.grad.numpy(), rtol=1e-5)


def test_unsaturated_grad_matches_logits_form():
    """Away from saturation the probs-space grad wrt logits must equal the
    stable logits-space grad (chain through sigmoid)."""
    # (avoid x == 0 exactly: max(x, 0) has an ill-defined subgradient there)
    x = jnp.array([-3.0, -0.5, 0.7, 1.2, 4.0])
    y = jnp.array([1.0, 0.0, 1.0, 0.0, 1.0])
    g_probs = jax.grad(lambda x: bce_probs(jax.nn.sigmoid(x), y))(x)
    g_logits = jax.grad(lambda x: bce_logits(x, y))(x)
    np.testing.assert_allclose(np.asarray(g_probs), np.asarray(g_logits), atol=1e-6)
