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


def bce_probs(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Reference-exact BCE on probabilities, incl. torch's -100 log clamp."""
    p = probs.reshape(-1)
    y = targets.reshape(-1)
    log_p = jnp.clip(jnp.log(p), -100.0, None)
    log_1p = jnp.clip(jnp.log1p(-p), -100.0, None)
    return -jnp.mean(y * log_p + (1.0 - y) * log_1p)


def bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Stable BCE from logits: mean(max(x,0) - x*y + log(1+exp(-|x|)))."""
    x = logits.reshape(-1)
    y = targets.reshape(-1)
    return jnp.mean(jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x))))
