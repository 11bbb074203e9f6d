"""3x3 SAME conv written as im2col + one matmul IN THE FORWARD.

Why a third conv implementation (vs nn.Conv and ops.fast_conv):

PERF.md's round-2 unifying finding is that ANY custom_vjp inserted into the
B=1 training scan — even a pure-XLA one like ops.fast_conv — costs 350-700
us/step beyond its op-local win, because the custom-VJP boundary forfeits
XLA's global fusion of the uninterrupted backward. This module removes the
boundary entirely: the *forward* is expressed as

    patches = concat of the 9 shifted SAME views      (B, H, W, 9*Ci)
    y       = patches @ kernel.reshape(9*Ci, Co) + b  (one dot_general)

in plain differentiable XLA ops, so autodiff itself emits
  * dw = patches^T @ dy        — one MXU matmul (the B=1-degenerate
    filter-gradient conv, which XLA lowers as a conv with a 101x101
    "filter", never appears), and
  * d_patches = dy @ kernel^T  — one matmul, followed by the transpose of
    the 9 static slices (9 pads + adds — cheap elementwise),
with no custom-call or custom-VJP scheduling barrier anywhere: XLA keeps
full freedom to fuse/schedule across the whole step.

Same math as the reference conv (src/unet/unet_p_res.py:147-153 uses
nn.Conv2d(k3, p1)); accumulation order is matmul- instead of conv-ordered
(last-ulp fp32 differences; trajectory parity is tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.fast_conv import _patches


def conv3_same_taps(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 SAME conv as nine shifted (B*H*W, Ci) @ (Ci, Co) matmuls — the
    wide-channel counterpart of conv3_same_patches. No patches concat (the
    im2col blowup that makes the patches form lose at low-res wide levels);
    autodiff emits per-tap dw matmuls (Ci x Co outputs, contraction over
    B*H*W) instead of XLA's B=1 filter-gradient conv. Same math, matmul
    accumulation order."""
    b, h, w, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = None
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            xs = xp[:, dy : dy + h, dx : dx + w, :]
            t = jax.lax.dot_general(xs, kernel[dy, dx], (((3,), (0,)), ((), ())))
            y = t if y is None else y + t
    return y + bias


def convT3_s2_valid_patches(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """ConvTranspose k3/s2/VALID (torch ConvTranspose2d semantics — the
    reference decoder op, src/unet/unet_p_res.py:203) as four parity-phase
    matmuls + interleave, all plain differentiable XLA ops.

    From y[o] = sum_i x[i] * K[o - 2i] (o - 2i in [0, 2]):
      even o=2a:  x[a] K[0] + x[a-1] K[2]   (a 2-tap conv)
      odd  o=2a+1: x[a] K[1]                (a 1-tap conv)
    so the 2-D output splits into phases (even/odd row x even/odd col) that
    are 2x2 / 2x1 / 1x2 / 1x1 convs of x — here im2col matmuls, so autodiff
    emits matmul filter-gradients (the B=1 dw fix, same as conv3_same_patches).

    x: (B, h, w, Ci); kernel: (3, 3, Co, Ci) — flax ConvTranspose
    transpose_kernel=True layout; bias: (Co,). Returns (B, 2h+1, 2w+1, Co).
    """
    b, h, w, ci = x.shape
    co = kernel.shape[2]
    k = jnp.transpose(kernel, (0, 1, 3, 2))  # (kh, kw, Ci, Co)

    def dot(p, t):
        # p: (B, H', W', T*Ci), t: (T, Ci, Co) tap-major
        return jax.lax.dot_general(
            p, t.reshape(-1, co), (((p.ndim - 1,), (0,)), ((), ()))
        )

    xr = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))  # row-padded (h+2)
    xc = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # col-padded (w+2)
    xrc = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # even-even: y[2a,2b] = sum_{da,db in {0,1}} xpad[a+da, b+db] K[2-2da, 2-2db]
    p_ee = jnp.concatenate(
        [xrc[:, da : da + h + 1, db : db + w + 1, :] for da in (0, 1) for db in (0, 1)], axis=-1
    )
    t_ee = jnp.stack([k[2 - 2 * da, 2 - 2 * db] for da in (0, 1) for db in (0, 1)])
    y_ee = dot(p_ee, t_ee)  # (B, h+1, w+1, Co)

    # even-odd: y[2a,2b+1] = sum_da xrpad[a+da, b] K[2-2da, 1]
    p_eo = jnp.concatenate([xr[:, da : da + h + 1, :, :] for da in (0, 1)], axis=-1)
    y_eo = dot(p_eo, jnp.stack([k[2, 1], k[0, 1]]))  # (B, h+1, w, Co)

    # odd-even: y[2a+1,2b] = sum_db xcpad[a, b+db] K[1, 2-2db]
    p_oe = jnp.concatenate([xc[:, :, db : db + w + 1, :] for db in (0, 1)], axis=-1)
    y_oe = dot(p_oe, jnp.stack([k[1, 2], k[1, 0]]))  # (B, h, w+1, Co)

    # odd-odd: y[2a+1,2b+1] = x[a,b] K[1,1]
    y_oo = dot(x, k[1, 1][None])  # (B, h, w, Co)

    def interleave(a, b_, axis, n_out):
        # a leads: out[2i] = a[i], out[2i+1] = b_[i]; b_ may be one shorter
        if b_.shape[axis] < a.shape[axis]:
            cfg = [(0, 0)] * b_.ndim
            cfg[axis] = (0, a.shape[axis] - b_.shape[axis])
            b_ = jnp.pad(b_, cfg)
        z = jnp.stack([a, b_], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] = 2 * a.shape[axis]
        z = z.reshape(shape)
        return jax.lax.slice_in_dim(z, 0, n_out, axis=axis)

    top = interleave(y_ee, y_eo, 2, 2 * w + 1)  # even rows (B, h+1, 2w+1, Co)
    bot = interleave(y_oe, y_oo, 2, 2 * w + 1)  # odd rows  (B, h,   2w+1, Co)
    y = interleave(top, bot, 1, 2 * h + 1)  # (B, 2h+1, 2w+1, Co)
    return y + bias


# Experiment knobs (module-level so probes can A/B them; defaults = the
# measured-best configuration on v5e, PERF.md).
EXTENDED_GATE = False  # also patch Cin <= 2*max_c convs at >= 40px levels
PATCH_CONVT = False  # phase-decomposed ConvTranspose in the decoder
TAP_WIDE = True  # 9-tap matmul form for wide (Cin>=64) convs at >=40px levels


def gate_state() -> tuple:
    """Current values of the experiment knobs above. The knobs change what
    tracing emits, so every memoized jit-factory (train/loop.py,
    parallel/dp.py) keys its cache on this tuple — flipping a knob then
    rebuilding an epoch fn must re-trace, not return the stale executable."""
    return (TAP_WIDE, EXTENDED_GATE, PATCH_CONVT)


def worth_taps(h: int, w: int, cin: int, max_c: int, batch: int = 1) -> bool:
    """Gate for conv3_same_taps. The wide levels' dw is the largest remaining
    B=1 cost (193 us by a freeze probe), but the tap form only wins net where
    the spatial extent keeps its matmuls big: Cin>=64 at >=40px (the decoder's
    50-px Cin=64 convs; 992 vs 982 imgs/s). Applying it at the low-res wide
    levels measured NET-negative (937 imgs/s) — their XLA conv forward is
    already good and the tap glue costs more than the dw it saves (PERF.md).
    Batch-gated like worth_patching: the B=1 dw pathology it fixes does not
    exist once the batch fills the MXU."""
    return TAP_WIDE and batch == 1 and cin >= 64 and h * w >= 1600


def worth_patching(h: int, w: int, cin: int, max_c: int, batch: int = 1) -> bool:
    """Static gate: the im2col forward wins where the filter-gradient conv is
    most degenerate — high-resolution, thin-channel levels AT BATCH 1.
    Measured on v5e (PERF.md): Cin<=32 wins at every level present at B=1
    (fp32 +34%, bf16 +51%), but the 9x patches tensor turns into pure HBM
    traffic once the batch fills the MXU — 8 lanes -8%, 128 lanes -76%
    (round 3) — so any batch > 1 falls back to the plain XLA conv."""
    if batch > 1:
        return False
    if cin <= max_c:
        return True
    return EXTENDED_GATE and cin <= 2 * max_c and h * w >= 1600


def worth_patching_convT(h_out: int, w_out: int, cin: int, max_c: int) -> bool:
    """Gate for the decoder's ConvTranspose ops (convT3_s2_valid_patches)."""
    return PATCH_CONVT and worth_patching(h_out, w_out, cin, max_c)


def conv3_same_patches(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """y = conv3x3_SAME(x, kernel) + bias via im2col matmul.

    x: (B, H, W, Ci); kernel: (3, 3, Ci, Co) HWIO (same layout/params as
    nn.Conv); bias: (Co,).
    """
    ci = x.shape[-1]
    co = kernel.shape[-1]
    p = _patches(x)  # (B, H, W, 9*Ci), tap-major — matches kernel.reshape
    y = jax.lax.dot_general(p, kernel.reshape(9 * ci, co), (((p.ndim - 1,), (0,)), ((), ())))
    return y + bias
