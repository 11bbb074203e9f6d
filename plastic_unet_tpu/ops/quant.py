"""int8 post-training quantization math for the serving path.

A capability EXTENSION (the reference, /root/reference/src/infer.py, serves
fp32 only); built because the TPU v5e MXU executes int8 matmuls/convs at 2x
the bf16 rate (394 vs 197 TOP/s), and the serving path is conv-bound (36.5%
bf16 MFU at the tuned chunk=128 config, PERF.md round-2/round-3 serving
sections) — int8 is the one dtype lever left above bf16.

Scheme (standard symmetric PTQ, chosen for exactness of the int path):
  * activations: per-tensor symmetric int8, scale s_x = amax / 127 with
    amax calibrated as a running max(|x|) over a representative batch
    (models.blocks.QuantConv3 in 'calib' mode records it in the 'quant'
    flax collection).
  * weights: per-output-channel symmetric int8, s_w[c] = max(|w[..,c]|)/127,
    computed on the fly from the fp32 params (the param tree is UNCHANGED —
    same checkpoints load for fp32, bf16 and int8 serving).
  * accumulation: int32 (exact — the MXU accumulates int8 products in int32,
    and XLA's preferred_element_type=int32 guarantees it end-to-end), then
    one fused dequant: y = acc * (s_x * s_w[c]) + bias.
  * zero-point: none (symmetric), so SAME zero-padding is exact in the
    quantized domain.

No zero-point + symmetric-per-channel keeps every op XLA-fusable: quantize
(round/clip/cast) fuses into the preceding elementwise block, dequant fuses
into the following bias+ReLU. The only new MXU op is the int8 conv itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def act_qparams(amax: jax.Array):
    """(inv_scale, scale) for a per-tensor symmetric int8 activation range.
    amax == 0 degenerates to scale 0 (the quantized tensor is all zeros and
    the dequantized output is exactly the bias)."""
    amax = amax.astype(jnp.float32)
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    scale = jnp.where(amax > 0, amax / 127.0, 0.0)
    return inv, scale


def quantize_act(x: jax.Array, amax: jax.Array):
    """Quantize activations to int8 with the calibrated per-tensor range.
    Values beyond the calibration range saturate at +-127. Returns
    (x_int8, scale)."""
    inv, scale = act_qparams(amax)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def quantize_weight(kernel: jax.Array, cout_axis: int):
    """Per-output-channel symmetric int8 weight quantization. Returns
    (w_int8, scale[c_out]). All-zero channels get scale 0 (exact)."""
    k = kernel.astype(jnp.float32)
    axes = tuple(a for a in range(k.ndim) if a != cout_axis)
    wmax = jnp.max(jnp.abs(k), axis=axes)
    inv = jnp.where(wmax > 0, 127.0 / wmax, 0.0)
    scale = jnp.where(wmax > 0, wmax / 127.0, 0.0)
    shape = [1] * k.ndim
    shape[cout_axis] = -1
    q = jnp.clip(jnp.round(k * inv.reshape(shape)), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def qconv3_same(x: jax.Array, kernel: jax.Array, bias: jax.Array, amax: jax.Array,
                out_dtype=jnp.float32) -> jax.Array:
    """3x3 SAME-padded stride-1 conv in int8 with int32 accumulation.
    x: (..., H, W, Cin) NHWC; kernel: (3, 3, Cin, Cout) HWIO fp32;
    bias: (Cout,) fp32; amax: scalar calibrated activation range."""
    qx, sx = quantize_act(x, amax)
    qw, sw = quantize_weight(kernel, cout_axis=3)
    lead = qx.shape[:-3]
    qx4 = qx.reshape((-1,) + qx.shape[-3:])
    dn = lax.conv_dimension_numbers(qx4.shape, qw.shape, ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        qx4, qw, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)
    return y.reshape(lead + y.shape[-3:]).astype(out_dtype)


def qconvT3_s2_valid(x: jax.Array, kernel: jax.Array, bias: jax.Array, amax: jax.Array,
                     out_dtype=jnp.float32) -> jax.Array:
    """ConvTranspose k3/s2/VALID (the UpRes upsampler, reference
    unet_p_res.py:204) in int8 with int32 accumulation.
    kernel: (3, 3, Cout, Cin) — flax transpose_kernel=True layout."""
    qx, sx = quantize_act(x, amax)
    qw, sw = quantize_weight(kernel, cout_axis=2)
    lead = qx.shape[:-3]
    qx4 = qx.reshape((-1,) + qx.shape[-3:])
    acc = lax.conv_transpose(
        qx4, qw, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw) + bias.astype(jnp.float32)
    return y.reshape(lead + y.shape[-3:]).astype(out_dtype)
