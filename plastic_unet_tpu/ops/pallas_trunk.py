"""Fused Pallas TPU kernel for the UNetPRes residual tail at B=1.

The reference-parity training mode is a strictly sequential batch-1 lifetime
stream (src/train.py:91-112), so step time is a SUM of per-op costs; the
round-2 breakdown (PERF.md) measured 16.6 us marginal per small XLA conv with
the MXU nearly idle. Every DownRes / Middle / UpRes block ends with the same
4-conv residual tail (reference unet_p_res.py:166-238):

    h1   = relu(x0)                  # inplace-ReLU quirk: skip = relu(input)
    x1   = conv(relu(conv(h1))) + h1
    h2   = relu(x1)
    x2   = conv(relu(conv(h2))) + h2
    out  = relu(x2)

This module fuses that tail — 4 convs + 7 elementwise ops, and their whole
backward — into ONE forward and ONE backward Pallas kernel with every
intermediate resident in VMEM.

Layout ("packed flat"): activations (H, W, C) are stored as
(rp, L) = (H*PW/P, P*C) where PW = W rounded up to the pack factor
P = max(128 // C, 1): P consecutive pixels share a 128-lane row, so C=16
tensors occupy full lanes instead of 1/8 of them. A 3x3 SAME conv becomes 9
statically-shifted views (pltpu.roll on rows + a lane rotation with
cross-row carry for sub-P shifts) multiplied on the MXU by block-diagonal
"big" weights kron(I_P, W_tap) (L, L) — full 128x128 MXU tiles regardless of
how thin C is. The pack/unpack at the kernel boundary is a free reshape in
XLA (identical bytes); only the W->PW pad costs an op.

Gradients: custom VJP. The backward kernel walks the chain in reverse —
input-gradients via the spatially-flipped, block-transposed big weights
(conv^T == conv(flip(W)) for SAME/stride-1), weight-gradients as per-tap
row-contractions shift_t(input)^T @ d_out. The big-weight construction
(einsum with eye(P)) stays OUTSIDE the custom_vjp, so XLA's autodiff of the
einsum folds the per-tap big gradients back to the (3,3,C,C) kernel and the
tiled bias back to (C,) automatically.

Numerics: in-kernel matmuls follow the ambient jax.default_matmul_precision
(parity mode = HIGHEST = true-fp32 passes), same as the XLA path. Verified
against jax.vjp of the XLA blocks in tests/test_pallas_trunk.py.
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


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    # lane-padded temporaries can exceed the conservative default scoped cap
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pack_factor(c: int) -> int:
    if c <= 128:
        if 128 % c:
            raise ValueError(
                f"pallas_trunk: channel count {c} must divide 128 (use a power-of-two 'neurons')"
            )
        return 128 // c
    if c % 128:
        raise ValueError(
            f"pallas_trunk: channel count {c} must be a multiple of 128 (use a power-of-two 'neurons')"
        )
    return 1


def worth_fusing(h: int, w: int, c: int) -> bool:
    """Per-level gate: the fused tail wins where XLA's backward (the dw
    convs especially) is overhead-bound. Measured on v5e with full param
    grads (PERF.md round 2): 101x101x16 fused 107.9 vs XLA 218.8 us (2x win);
    12x12x128 18.3 vs 22.8 (win); 50x50x32 and 25x25x64: XLA wins. Gate on
    pixel count or full-lane channels; override the pixel threshold with
    PLASTIC_UNET_FUSE_MIN_PIXELS (tests set 0 to force fusion at toy sizes)."""
    import os

    min_pixels = int(os.environ.get("PLASTIC_UNET_FUSE_MIN_PIXELS", str(90 * 90)))
    wide = os.environ.get("PLASTIC_UNET_FUSE_WIDE", "0") == "1"
    return h * w >= min_pixels or (wide and c >= 128)


def geometry(h: int, w: int, c: int):
    """(P, PW, rp, L) for the packed-flat layout."""
    p = pack_factor(c)
    pw = _round_up(w, p)
    rp = h * pw // p
    return p, pw, rp, p * c


def pack_hw(x: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """(H, W, C) -> (rp, L). Pure reshape after the W->PW zero-pad."""
    p, pw, rp, l = geometry(h, w, c)
    if pw != w:
        x = jnp.pad(x, ((0, 0), (0, pw - w), (0, 0)))
    return x.reshape(rp, l)


def unpack_hw(xp: jax.Array, h: int, w: int, c: int) -> jax.Array:
    p, pw, rp, l = geometry(h, w, c)
    return xp.reshape(h, pw, c)[:, :w, :]


def big_weights(wk: jax.Array) -> jax.Array:
    """HWIO (3, 3, C, C) -> per-tap block-diagonal (9, L, L)."""
    c = wk.shape[2]
    p = pack_factor(c)
    w9 = wk.reshape(9, c, c)
    if p == 1:
        return w9
    return jnp.einsum("ab,tij->taibj", jnp.eye(p, dtype=wk.dtype), w9).reshape(9, p * c, p * c)


def big_bias(b: jax.Array) -> jax.Array:
    """(C,) -> (1, L) tiled across the P pixel groups."""
    p = pack_factor(b.shape[0])
    return jnp.tile(b, p).reshape(1, -1)


def _flip_big(wb: jax.Array) -> jax.Array:
    """Big weights of the transpose conv: tap-reversed, block-transposed."""
    return jnp.transpose(wb[::-1], (0, 2, 1))


def _coords(rp: int, l: int, p: int, c: int, pw: int):
    pr = jax.lax.broadcasted_iota(jnp.int32, (rp, l), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rp, l), 1)
    flat = pr * p + lane // c
    return flat % pw, flat // pw  # (w, h) planes


def _pshift(x, s: int, p: int, c: int, rp: int, l: int):
    """y[flat r] = x[flat r + s] (circular; callers mask the wraps)."""
    from jax.experimental.pallas import tpu as pltpu

    q, rem = divmod(s, p)
    y = x
    if q % rp:
        y = pltpu.roll(y, shift=(-q) % rp, axis=0)
    if rem:
        ls = (l - rem * c) % l
        a = pltpu.roll(y, shift=ls, axis=1)
        b = pltpu.roll(pltpu.roll(y, shift=rp - 1, axis=0), shift=ls, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rp, l), 1)
        y = jnp.where(lane >= l - rem * c, b, a)
    return y


class _Geo:
    """Static geometry + in-kernel conv helpers for one (H, W, C)."""

    def __init__(self, h: int, w: int, c: int):
        self.h, self.w, self.c = h, w, c
        self.p, self.pw, self.rp, self.l = geometry(h, w, c)

    def masks(self):
        """The 9 source-validity masks, computed ONCE per kernel invocation
        and reused by every conv in the fused chain."""
        wq, hq = _coords(self.rp, self.l, self.p, self.c, self.pw)
        return [
            (wq + dx >= 0) & (wq + dx < self.w) & (hq + dy >= 0) & (hq + dy < self.h)
            for dy, dx in _TAPS
        ]

    def tap_views(self, x, masks):
        """9 masked shifted views. The two (expensive, lane-carry) column
        shifts are hoisted and shared across the three row offsets."""
        from jax.experimental.pallas import tpu as pltpu

        cols = {0: x, -1: _pshift(x, -1, self.p, self.c, self.rp, self.l),
                1: _pshift(x, 1, self.p, self.c, self.rp, self.l)}
        rows_per_dy = self.pw // self.p
        views = []
        for t, (dy, dx) in enumerate(_TAPS):
            xs = cols[dx]
            if dy:
                xs = pltpu.roll(xs, shift=(-dy * rows_per_dy) % self.rp, axis=0)
            views.append(jnp.where(masks[t], xs, 0.0))
        return views

    def conv(self, x, wb_ref, bt, masks):
        views = self.tap_views(x, masks)
        acc = None
        for t in range(9):
            d = jnp.dot(views[t], wb_ref[t], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc if bt is None else acc + bt

    def dw(self, x, d, masks):
        """Per-tap weight grads: (9, L, L) stack of shift_t(x)^T @ d."""
        views = self.tap_views(x, masks)
        outs = []
        for t in range(9):
            outs.append(
                jax.lax.dot_general(
                    views[t], d, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.stack(outs)


def _tail_fwd_kernel(g: _Geo, x0_ref, wb11, bt11, wb12, bt12, wb21, bt21, wb22, bt22,
                     out_ref, pre11_ref, x1_ref, pre21_ref, x2_ref):
    masks = g.masks()
    h1 = jnp.maximum(x0_ref[:], 0.0)
    pre11 = g.conv(h1, wb11, bt11[0, :], masks)
    pre11_ref[:] = pre11
    x1 = g.conv(jnp.maximum(pre11, 0.0), wb12, bt12[0, :], masks) + h1
    x1_ref[:] = x1
    h2 = jnp.maximum(x1, 0.0)
    pre21 = g.conv(h2, wb21, bt21[0, :], masks)
    pre21_ref[:] = pre21
    x2 = g.conv(jnp.maximum(pre21, 0.0), wb22, bt22[0, :], masks) + h2
    x2_ref[:] = x2
    out_ref[:] = jnp.maximum(x2, 0.0)


def _tail_bwd_kernel(g: _Geo, x0_ref, pre11_ref, x1_ref, pre21_ref, x2_ref,
                     wf11, wf12, wf21, wf22, g_ref,
                     dx0_ref, dwb11, dbt11, dwb12, dbt12, dwb21, dbt21, dwb22, dbt22):
    masks = g.masks()
    wq, _ = _coords(g.rp, g.l, g.p, g.c, g.pw)
    valid = wq < g.w  # pad columns carry no true gradient
    gg = jnp.where(valid, g_ref[:], 0.0)
    d_x2 = gg * (x2_ref[:] > 0.0)
    # --- residual block 2 (x1 -> x2) ---
    r21 = jnp.maximum(pre21_ref[:], 0.0)
    dwb22[:] = g.dw(r21, d_x2, masks)
    dbt22[0, :] = jnp.sum(d_x2, axis=0)
    d_r21 = jnp.where(valid, g.conv(d_x2, wf22, None, masks), 0.0)
    d_pre21 = d_r21 * (pre21_ref[:] > 0.0)
    h2 = jnp.maximum(x1_ref[:], 0.0)
    dwb21[:] = g.dw(h2, d_pre21, masks)
    dbt21[0, :] = jnp.sum(d_pre21, axis=0)
    d_h2 = jnp.where(valid, g.conv(d_pre21, wf21, None, masks), 0.0) + d_x2
    d_x1 = d_h2 * (x1_ref[:] > 0.0)
    # --- residual block 1 (x0 -> x1) ---
    r11 = jnp.maximum(pre11_ref[:], 0.0)
    dwb12[:] = g.dw(r11, d_x1, masks)
    dbt12[0, :] = jnp.sum(d_x1, axis=0)
    d_r11 = jnp.where(valid, g.conv(d_x1, wf12, None, masks), 0.0)
    d_pre11 = d_r11 * (pre11_ref[:] > 0.0)
    h1 = jnp.maximum(x0_ref[:], 0.0)
    dwb11[:] = g.dw(h1, d_pre11, masks)
    dbt11[0, :] = jnp.sum(d_pre11, axis=0)
    d_h1 = jnp.where(valid, g.conv(d_pre11, wf11, None, masks), 0.0) + d_x1
    dx0_ref[:] = d_h1 * (x0_ref[:] > 0.0)


@functools.lru_cache(maxsize=None)
def make_residual_tail(h: int, w: int, c: int):
    """Build the fused residual-tail op for a static (H, W, C).

    Returns tail(x0p, wb11, bt11, wb12, bt12, wb21, bt21, wb22, bt22) -> outp
    on packed (rp, L) activations, with big-form weights (9, L, L) and tiled
    biases (1, L); differentiable via the fused backward kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = _Geo(h, w, c)
    rp, l = g.rp, g.l
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    act = jax.ShapeDtypeStruct((rp, l), jnp.float32)
    wbig = jax.ShapeDtypeStruct((9, l, l), jnp.float32)
    bbig = jax.ShapeDtypeStruct((1, l), jnp.float32)

    conv_flops = 2 * rp * l * l * 9

    fwd_call = pl.pallas_call(
        functools.partial(_tail_fwd_kernel, g),
        out_shape=[act] * 5,
        in_specs=[vmem] * 9,
        out_specs=[vmem] * 5,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
        cost_estimate=pl.CostEstimate(flops=4 * conv_flops, bytes_accessed=4 * rp * l * 10, transcendentals=0),
    )

    bwd_call = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, g),
        out_shape=[act] + [wbig, bbig] * 4,
        in_specs=[vmem] * 10,
        out_specs=[vmem] * 9,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
        cost_estimate=pl.CostEstimate(flops=8 * conv_flops, bytes_accessed=4 * rp * l * 16, transcendentals=0),
    )

    @jax.custom_vjp
    def tail(x0p, wb11, bt11, wb12, bt12, wb21, bt21, wb22, bt22):
        out, *_ = fwd_call(x0p, wb11, bt11, wb12, bt12, wb21, bt21, wb22, bt22)
        return out

    def tail_fwd(x0p, wb11, bt11, wb12, bt12, wb21, bt21, wb22, bt22):
        out, pre11, x1, pre21, x2 = fwd_call(x0p, wb11, bt11, wb12, bt12, wb21, bt21, wb22, bt22)
        return out, (x0p, pre11, x1, pre21, x2, wb11, wb12, wb21, wb22)

    def tail_bwd(res, ct):
        x0p, pre11, x1, pre21, x2, wb11, wb12, wb21, wb22 = res
        dx0, dwb11, dbt11, dwb12, dbt12, dwb21, dbt21, dwb22, dbt22 = bwd_call(
            x0p, pre11, x1, pre21, x2,
            _flip_big(wb11), _flip_big(wb12), _flip_big(wb21), _flip_big(wb22), ct,
        )
        return (dx0, dwb11, dbt11, dwb12, dbt12, dwb21, dbt21, dwb22, dbt22)

    tail.defvjp(tail_fwd, tail_bwd)
    return tail


def residual_tail_apply(x0: jax.Array, params: dict, h: int, w: int, c: int) -> jax.Array:
    """Convenience wrapper on (H, W, C) activations with HWIO conv params.

    params: {"w11","b11","w12","b12","w21","b21","w22","b22"} — the four
    convs of the two residual blocks, in execution order."""
    tail = make_residual_tail(h, w, c)
    xp = pack_hw(x0, h, w, c)
    outp = tail(
        xp,
        big_weights(params["w11"]), big_bias(params["b11"]),
        big_weights(params["w12"]), big_bias(params["b12"]),
        big_weights(params["w21"]), big_bias(params["b21"]),
        big_weights(params["w22"]), big_bias(params["b22"]),
    )
    return unpack_hw(outp, h, w, c)
