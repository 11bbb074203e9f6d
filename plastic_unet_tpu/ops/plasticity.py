"""Differentiable synaptic plasticity — trace rules and the plastic head.

Reference semantics (src/unet/unet_p_res.py:115-140, identically duplicated
in src/unet/unet_p.py:69-94):

  activin  = reshape(unet_logits, (nbf, nbf))
  activ    = activin @ (w + alpha * hebb)        # 'free' alpha (elementwise)
           | activin @ (w + alpha_scalar * hebb) # 'yoked' alpha (scalar)
  activout = sigmoid(activ)                       # <- the predicted mask
  hebb'    = trace update (see below)

Trace rules — both are rank-1 updates driven by ROW 0 of the activations
(a load-bearing reference quirk, preserved here; SURVEY.md §2.1):

  * hebb (unet_p_res.py:128): `torch.bmm(activin.unsqueeze(2),
    activout.unsqueeze(1))[0]` builds the per-row outer products and then
    `[0]` keeps only row 0's, so
        hebb' = (1 - eta) * hebb + eta * outer(activin[0], activout[0])
  * oja (unet_p_res.py:130): explicitly row 0,
        hebb' = hebb + eta * (activin[0][:,None] - hebb * activout[0][None,:])
                          * activout[0][None,:]

Learned parameters (unet_p_res.py:32-34): w ~ .01*randn(nbf,nbf),
alpha ~ .01*rand(nbf,nbf), eta = .01 (scalar). Note eta only enters the trace
update; since the carried trace is detached every sample (train.py:97-99),
eta receives zero gradient and stays at .01 under Adam — preserved behavior.

All functions here are pure and jit/vmap/scan-friendly. The fused Pallas TPU
kernel for the whole head lives in ops/pallas_plastic.py; this module is the
XLA-fallback / golden implementation it is tested against.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

RULES = ("hebb", "oja")
ALFA_TYPES = ("free", "yoked")


class PlasticParams(NamedTuple):
    """Learnable parameters of the plastic head."""

    w: jax.Array  # (nbf, nbf) fixed weights
    alpha: jax.Array  # (nbf, nbf) for 'free'; broadcastable scalar for 'yoked'
    eta: jax.Array  # (1,) plasticity learning rate


def init_plastic_params(key: jax.Array, nbf: int, dtype=jnp.float32) -> PlasticParams:
    """Init matching reference distributions (unet_p_res.py:32-34)."""
    kw, ka = jax.random.split(key)
    return PlasticParams(
        w=(0.01 * jax.random.normal(kw, (nbf, nbf))).astype(dtype),
        alpha=(0.01 * jax.random.uniform(ka, (nbf, nbf))).astype(dtype),
        eta=(0.01 * jnp.ones((1,))).astype(dtype),
    )


def initial_zero_hebb(nbf: int, dtype=jnp.float32) -> jax.Array:
    """Zero trace (reference initialZeroHebb, unet_p_res.py:136-140)."""
    return jnp.zeros((nbf, nbf), dtype=dtype)


def hebb_update(hebb: jax.Array, activin: jax.Array, activout: jax.Array, eta: jax.Array) -> jax.Array:
    """Hebbian trace: decay + rank-1 outer product of row 0."""
    outer = activin[0][:, None] * activout[0][None, :]
    return (1.0 - eta) * hebb + eta * outer


def oja_update(hebb: jax.Array, activin: jax.Array, activout: jax.Array, eta: jax.Array) -> jax.Array:
    """Oja trace: stable bounded update from row 0."""
    yin = activin[0][:, None]  # (nbf, 1)
    yout = activout[0][None, :]  # (1, nbf)
    return hebb + eta * (yin - hebb * yout) * yout


def plastic_head(
    params: PlasticParams,
    activin: jax.Array,
    hebb: jax.Array,
    *,
    rule: str = "hebb",
    alfa_type: str = "free",
) -> tuple[jax.Array, jax.Array]:
    """The full plastic head: (activout, new_hebb) from (nbf, nbf) logits.

    Pure XLA implementation; reference parity anchor for the Pallas kernel.
    """
    if rule not in RULES:
        raise ValueError("Must select one learning rule ('hebb' or 'oja'), got %r" % (rule,))
    if alfa_type not in ALFA_TYPES:
        raise ValueError("Must select one plasticity coefficient type ('free' or 'yoked'), got %r" % (alfa_type,))

    # 'free': alpha is (nbf, nbf) elementwise; 'yoked': a shared scalar
    # (unet_p_res.py:118-123) — broadcasting covers both with one expression.
    eff_w = params.w + params.alpha * hebb

    activ = jnp.dot(activin, eff_w, preferred_element_type=jnp.float32).astype(activin.dtype)
    activout = jax.nn.sigmoid(activ)

    if rule == "hebb":
        new_hebb = hebb_update(hebb, activin, activout, params.eta)
    else:
        new_hebb = oja_update(hebb, activin, activout, params.eta)

    return activout, new_hebb


def plastic_head_logits(
    params: PlasticParams,
    activin: jax.Array,
    hebb: jax.Array,
    *,
    rule: str = "hebb",
    alfa_type: str = "free",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Like :func:`plastic_head` but also returns pre-sigmoid logits, so the
    loss can be computed in stable logit space (same value as BCE on the
    sigmoid output in exact arithmetic)."""
    if alfa_type not in ALFA_TYPES:
        raise ValueError("Must select one plasticity coefficient type ('free' or 'yoked'), got %r" % (alfa_type,))
    eff_w = params.w + params.alpha * hebb
    activ = jnp.dot(activin, eff_w, preferred_element_type=jnp.float32).astype(activin.dtype)
    activout = jax.nn.sigmoid(activ)
    if rule == "hebb":
        new_hebb = hebb_update(hebb, activin, activout, params.eta)
    elif rule == "oja":
        new_hebb = oja_update(hebb, activin, activout, params.eta)
    else:
        raise ValueError("Must select one learning rule ('hebb' or 'oja'), got %r" % (rule,))
    return activ, activout, new_hebb
