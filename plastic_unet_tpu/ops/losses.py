"""Losses. BCE with reference-exact semantics (torch nn.BCELoss, train.py:70).

torch BCELoss(p, y) = mean(-(y*log(p) + (1-y)*log(1-p))) with each log term
clamped at -100. `bce_probs` matches that exactly; `bce_logits` computes the
same quantity in numerically stable logit space (identical in exact
arithmetic since the model output is sigmoid(activ), unet_p_res.py:125) and
is the default on the training path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def bce_probs(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Reference-exact BCE on probabilities, incl. torch's -100 log clamp.

    Custom VJP matching torch's backward exactly:
    grad_p = (p - y) / max(p*(1-p), 1e-12) / N. The naive autodiff of the
    clamped-log form NaNs at saturated p (0 * inf through the clip) — a bug
    torch avoids via the denominator clamp, discovered when long showdown
    runs saturated the sigmoid (tests/test_losses_saturation.py)."""
    p = probs.reshape(-1)
    y = targets.reshape(-1)
    log_p = jnp.clip(jnp.log(p), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-p), -100.0, None)
    return -jnp.mean(y * log_p + (1.0 - y) * log_1p)


def _bce_probs_fwd(probs, targets):
    return bce_probs(probs, targets), (probs, targets)


def _bce_probs_bwd(res, ct):
    probs, targets = res
    p = probs.reshape(-1)
    y = targets.reshape(-1)
    n = p.shape[0]
    # torch binary_cross_entropy backward: (p - y) / clamp_min(p*(1-p), 1e-12)
    dp = (p - y) / jnp.maximum(p * (1.0 - p), 1e-12) / n
    # d/dy = -(log p - log(1-p)) / n with the same log clamps
    dy = -(jnp.clip(jnp.log(p), -100.0, None) - jnp.clip(jnp.log1p(-p), -100.0, None)) / n
    return (ct * dp).reshape(probs.shape), (ct * dy).reshape(targets.shape)


bce_probs.defvjp(_bce_probs_fwd, _bce_probs_bwd)


def bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Stable BCE from logits: mean(max(x,0) - x*y + log(1+exp(-|x|)))."""
    x = logits.reshape(-1)
    y = targets.reshape(-1)
    return jnp.mean(jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x))))
