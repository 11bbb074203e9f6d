"""3x3 SAME conv with a hand-written XLA backward (B=1-friendly dw).

PERF.md round 2: the B=1 parity step spends ~700 us (over half the step) in
XLA's kernel-gradient (dw) convs — XLA lowers each as a conv with a 101x101
"filter", which is catastrophically inefficient at batch 1. This wrapper
keeps the forward and dx exactly as XLA convs but computes dw as an
im2col matmul:

    dw[kh, kw, ci, co] = sum_{b,h,w} patches[b, h, w, (kh,kw,ci)] * ct[b, h, w, co]

i.e. one (B*H*W, 9*Ci)^T @ (B*H*W, Co) contraction the MXU handles well.
Pure XLA ops — no custom-call scheduling interactions (unlike the Pallas
trunk kernels, which win in isolation but perturb the surrounding program;
PERF.md). Numerics: same math, matmul-accumulation order instead of conv
order (last-ulp fp32 differences; trajectory parity verified in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dn(x_shape, k_shape):
    return jax.lax.conv_dimension_numbers(x_shape, k_shape, ("NHWC", "HWIO", "NHWC"))


def _conv(x, k):
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=_dn(x.shape, k.shape))


def _patches(x):
    """(B, H, W, C) -> (B, H, W, 9*C) of 3x3 SAME neighborhoods, tap-major
    (same (kh, kw, ci) order as kernel.reshape(9*ci, co))."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in (0, 1, 2)
        for dx in (0, 1, 2)
    ]
    return jnp.concatenate(views, axis=-1)


@jax.custom_vjp
def conv3_same_fast(x, kernel, bias):
    """y = conv3x3_SAME(x, kernel) + bias. x: (B,H,W,Ci), kernel HWIO."""
    return _conv(x, kernel) + bias


def _fwd(x, kernel, bias):
    return conv3_same_fast(x, kernel, bias), (x, kernel)


def _bwd(res, ct):
    x, kernel = res
    # dx: SAME/stride-1 transpose == conv with the flipped, IO-swapped kernel
    kflip = jnp.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv(ct, kflip)
    # dw: im2col matmul instead of XLA's filter-gradient conv
    b, h, w, ci = x.shape
    co = ct.shape[-1]
    p = _patches(x).reshape(b * h * w, 9 * ci)
    dw = jax.lax.dot_general(
        p, ct.reshape(b * h * w, co), (((0,), (0,)), ((), ()))
    ).reshape(3, 3, ci, co)
    db = jnp.sum(ct, axis=(0, 1, 2))
    return dx, dw, db


conv3_same_fast.defvjp(_fwd, _bwd)
