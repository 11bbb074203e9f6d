"""Fused Pallas TPU kernel for the plastic head.

One kernel fuses the whole head (reference src/unet/unet_p_res.py:115-134):
    eff      = w + alpha (*) hebb           (VPU)
    activ    = activin @ eff                (MXU, fp32 accumulation)
    activout = sigmoid(activ)               (VPU)
    hebb'    = trace update (hebb|oja)      (VPU, rank-1 from row 0)
keeping every intermediate in VMEM — the op XLA won't naturally fuse across
the lifetime-scan carry (SURVEY.md §2.2). nbf is padded to the 128-lane
boundary outside the kernel; zero-padded w/alpha guarantee the padded region
never leaks into valid outputs (eff = w + alpha*hebb is zero there).

Differentiation: a custom VJP whose backward is jax.vjp of the pure-XLA
reference head (ops.plasticity.plastic_head_logits) at the saved primals —
gradients thus match autograd-through-the-update by construction (SURVEY.md
§7 hard part 3), at the cost of one recomputed ~128^3 matmul (trivial).
Verified in tests/test_pallas.py; runs in interpreter mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops import plasticity

_LANE = 128


def _round_up(n: int, m: int = _LANE) -> int:
    return ((n + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _head_kernel_hebb(x_ref, w_ref, a_ref, eta_ref, h_ref, activ_ref, out_ref, hnew_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    eta = eta_ref[0, 0]
    eff = w_ref[:] + a_ref[:] * h_ref[:]
    activ = jnp.dot(x_ref[:], eff, preferred_element_type=jnp.float32)
    activ_ref[:] = activ.astype(activ_ref.dtype)
    y = jax.nn.sigmoid(activ)
    out_ref[:] = y.astype(out_ref.dtype)
    # rank-1 row-0 outer product (the reference's bmm[...][0] quirk)
    x0 = x_ref[0, :]
    y0 = y[0, :]
    hnew_ref[:] = ((1.0 - eta) * h_ref[:] + eta * (x0[:, None] * y0[None, :])).astype(hnew_ref.dtype)


def _head_kernel_oja(x_ref, w_ref, a_ref, eta_ref, h_ref, activ_ref, out_ref, hnew_ref):
    eta = eta_ref[0, 0]
    eff = w_ref[:] + a_ref[:] * h_ref[:]
    activ = jnp.dot(x_ref[:], eff, preferred_element_type=jnp.float32)
    activ_ref[:] = activ.astype(activ_ref.dtype)
    y = jax.nn.sigmoid(activ)
    out_ref[:] = y.astype(out_ref.dtype)
    x0 = x_ref[0, :][:, None]
    y0 = y[0, :][None, :]
    hnew_ref[:] = (h_ref[:] + eta * (x0 - h_ref[:] * y0) * y0).astype(hnew_ref.dtype)


def _pallas_head_padded(x, w, alpha, eta, hebb, rule: str):
    """Run the fused kernel on pre-padded (P, P) inputs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = x.shape[0]
    kern = _head_kernel_hebb if rule == "hebb" else _head_kernel_oja
    eta2 = eta.reshape(1, 1)
    out_shape = [jax.ShapeDtypeStruct((p, p), x.dtype)] * 3
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[vmem, vmem, vmem, smem, vmem],
        out_specs=[vmem, vmem, vmem],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * p * p + 8 * p * p, bytes_accessed=8 * p * p * 4, transcendentals=p * p
        ),
    )(x, w, alpha, eta2, hebb)


def _xla_head(x, w, alpha, eta, hebb, rule: str, alfa_type: str):
    params = plasticity.PlasticParams(w=w, alpha=alpha, eta=eta)
    return plasticity.plastic_head_logits(params, x, hebb, rule=rule, alfa_type=alfa_type)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_plastic_head(x, w, alpha, eta, hebb, rule: str = "hebb", alfa_type: str = "free"):
    """(activ, activout, new_hebb) for one sample; all arrays (nbf, nbf),
    eta (1,). Pallas-fused forward, autograd-exact backward."""
    nbf = x.shape[0]
    p = _round_up(nbf)
    if alfa_type == "yoked":
        # yoked alpha is a scalar: broadcast to the padded matrix so the
        # padded-region invariant (alpha==0 there) is preserved via masking
        alpha_m = jnp.zeros((nbf, nbf), x.dtype) + alpha
    else:
        alpha_m = alpha
    if p != nbf:
        pad = ((0, p - nbf), (0, p - nbf))
        x_p = jnp.pad(x, pad)
        w_p = jnp.pad(w, pad)
        a_p = jnp.pad(alpha_m, pad)
        h_p = jnp.pad(hebb, pad)
    else:
        x_p, w_p, a_p, h_p = x, w, alpha_m, hebb
    activ, y, hnew = _pallas_head_padded(x_p, w_p, a_p, eta, h_p, rule)
    if p != nbf:
        activ, y, hnew = activ[:nbf, :nbf], y[:nbf, :nbf], hnew[:nbf, :nbf]
    return activ, y, hnew


def _fwd(x, w, alpha, eta, hebb, rule, alfa_type):
    out = fused_plastic_head(x, w, alpha, eta, hebb, rule, alfa_type)
    return out, (x, w, alpha, eta, hebb)


def _bwd(rule, alfa_type, res, cts):
    x, w, alpha, eta, hebb = res
    # Backward through the pure-XLA head at the same primals: gradients are
    # identical to autograd through the fused op (same math, fp32).
    _, vjp = jax.vjp(lambda *p: _xla_head(*p, rule=rule, alfa_type=alfa_type), x, w, alpha, eta, hebb)
    return vjp(cts)


fused_plastic_head.defvjp(_fwd, _bwd)


def plastic_head_pallas_batched(params, activin_b, hebb_b, *, rule: str = "hebb", alfa_type: str = "free"):
    """Batched fused head: activin_b, hebb_b (B, nbf, nbf) ->
    (activ, activout, new_hebb) each (B, nbf, nbf). Shared params."""
    if rule not in plasticity.RULES:
        raise ValueError("Must select one learning rule ('hebb' or 'oja'), got %r" % (rule,))
    if alfa_type not in plasticity.ALFA_TYPES:
        raise ValueError("Must select one plasticity coefficient type ('free' or 'yoked'), got %r" % (alfa_type,))
    fn = lambda a, h: fused_plastic_head(a, params.w, params.alpha, params.eta, h, rule, alfa_type)
    return jax.vmap(fn)(activin_b, hebb_b)
