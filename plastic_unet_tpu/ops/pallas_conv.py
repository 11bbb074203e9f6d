"""Pallas TPU kernels for small-channel 3x3 SAME convolutions at B=1.

Why this exists (PERF.md round-2 breakdown): the reference-parity training
mode is a strictly sequential lifetime stream (batch 1, src/train.py:91-112),
and its step time is dominated by ~150 small conv/conv-grad ops whose
per-op overhead (pipeline fill, fusion-boundary HBM roundtrips) dwarfs their
arithmetic. XLA cannot fuse across conv ops; Pallas can run a whole
conv->relu->conv->residual chain in ONE kernel with every intermediate in
VMEM.

Layout: activations are kept flattened as (H*W rows, C lanes) — "flat NHWC".
A 3x3 SAME conv is im2col built in VMEM from 9 statically-shifted views
(pltpu.roll over the flattened row axis + border masks from iota), followed
by one MXU matmul (R, 9*Cin) @ (9*Cin, Cout). Weights are pre-reshaped
outside to tap-major (9*Cin, Cout).

Gradients: conv3x3 SAME stride-1 backward w.r.t. input is the same conv with
the spatially-flipped, channel-transposed kernel; backward w.r.t. weights is
imcol^T @ dy (one MXU matmul, imcol recomputed in-kernel from the saved
input). Both are Pallas kernels; the chain op exposes a custom VJP.

These kernels target the B=1 parity mode; lane/DP throughput modes keep the
XLA convs (large batches already use the MXU well there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _params():
    """Raise the scoped-VMEM cap: lane padding inflates (R, 16) buffers 8x
    in VMEM (fp32 tile lane dim is 128), so the default 16 MB cap trips."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _border_masks(h: int, w: int, r_pad: int):
    """(9, R_pad, 1) bool masks: tap t valid at flat row r."""
    r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, 1), 0)
    wcol = r % w
    hrow = r // w
    masks = []
    for dy, dx in _TAPS:
        m = (
            (wcol + dx >= 0)
            & (wcol + dx < w)
            & (hrow + dy >= 0)
            & (hrow + dy < h)
        )
        masks.append(m)
    return masks


def _build_imcol(x, h: int, w: int, r_pad: int, cin: int, imcol_ref):
    """Fill imcol_ref (R_pad, 9*cin) from x (R_pad, cin)."""
    from jax.experimental.pallas import tpu as pltpu

    masks = _border_masks(h, w, r_pad)
    for t, (dy, dx) in enumerate(_TAPS):
        sh = dy * w + dx
        # circular roll bringing x[r+sh] to row r; wrapped rows are masked off
        shifted = pltpu.roll(x, shift=(-sh) % r_pad, axis=0) if sh else x
        imcol_ref[:, t * cin : (t + 1) * cin] = jnp.where(masks[t], shifted, 0.0)


def _conv_kernel(h: int, w: int, r_pad: int, cin: int, relu: bool, x_ref, w_ref, b_ref, out_ref, imcol):
    _build_imcol(x_ref[:], h, w, r_pad, cin, imcol)
    y = jnp.dot(imcol[:], w_ref[:], preferred_element_type=jnp.float32)
    y = y + b_ref[0, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y


def conv3x3_flat(x2: jax.Array, w2: jax.Array, b: jax.Array, h: int, w: int, relu: bool = False) -> jax.Array:
    """SAME 3x3 conv on a flattened (R_pad, Cin) activation.

    x2: (R_pad, Cin) with rows >= h*w ignored; w2: (9*Cin, Cout) tap-major
    (reshape of HWIO (3,3,Cin,Cout)); b: (Cout,). Returns (R_pad, Cout)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_pad, cin = x2.shape
    cout = w2.shape[1]
    kern = functools.partial(_conv_kernel, h, w, r_pad, cin, relu)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r_pad, cout), jnp.float32),
        in_specs=[vmem, vmem, vmem],
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((r_pad, 9 * cin), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * r_pad * 9 * cin * cout,
            bytes_accessed=4 * r_pad * (cin + 9 * cin + cout),
            transcendentals=0,
        ),
    )(x2, w2, b.reshape(1, cout))


def pack_weights(w: jax.Array) -> jax.Array:
    """HWIO (3,3,Cin,Cout) -> tap-major (9*Cin, Cout)."""
    k = w.shape
    return w.reshape(9 * k[2], k[3])


def flip_weights(w: jax.Array) -> jax.Array:
    """HWIO kernel for the input-gradient conv: spatial flip + I/O transpose."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def flatten_hw(x: jax.Array, sublane: int = 8) -> jax.Array:
    """(H, W, C) -> (R_pad, C) zero-padded to the sublane multiple."""
    hh, ww, c = x.shape
    r = hh * ww
    r_pad = _round_up(r, sublane)
    flat = x.reshape(r, c)
    if r_pad != r:
        flat = jnp.pad(flat, ((0, r_pad - r), (0, 0)))
    return flat


def unflatten_hw(x2: jax.Array, h: int, w: int) -> jax.Array:
    return x2[: h * w].reshape(h, w, x2.shape[1])
