"""Shared conv building blocks (NHWC, TPU-native).

Behavioral equivalents of the reference blocks (cites into /root/reference):
  conv_module / residual_block / pool_drop / middle / down / up / outconv
  (src/unet/unet_p_res.py:142-272) and double_conv / inconv / down / up /
  outconv (src/unet/unet_p.py:96-261).

Design notes (TPU-first, not a translation):
  * NHWC layout throughout — XLA's preferred conv layout on TPU.
  * Channel dropout (torch Dropout2d) = flax Dropout broadcast over the
    spatial dims, so the mask is per-(sample, channel).
  * Transposed conv uses ``transpose_kernel=True`` so its semantics (and a
    ported torch weight) match torch ConvTranspose2d exactly.
  * The skip-merge pad/crop reproduces the reference's
    ``F.pad(x, (d//2, int(d/2), ...))`` arithmetic (unet_p_res.py:215-217,
    unet_p.py:161-164) including truncation-vs-floor on odd negative diffs
    (crop-left-by-one) and the swapped H/W diff quirk (harmless on the
    square tiles this family uses; kept for fidelity).
  * Initializers match torch defaults (kaiming_uniform(a=sqrt(5)) kernels,
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) biases) so train-from-scratch follows
    the same init distribution as the reference.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# torch-default initializers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on a HWIO kernel: U(-b, b) with
    b = sqrt(1 / fan_in), fan_in = prod(kernel_hw) * in_channels."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_convT_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d init: fan_in computed from its (in, out, kh, kw)
    weight = kh*kw*out_channels. flax kernel shape with transpose_kernel=True
    is (kh, kw, out, in)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = math.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv3(features: int, in_features: int, name: str | None = None, dtype=None) -> nn.Conv:
    """3x3 'same' conv (stride 1, pad 1) with torch-default init."""
    return nn.Conv(
        features,
        (3, 3),
        padding=1,
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_bias_init(9 * in_features),
        name=name,
        dtype=dtype,
    )


class FastConv3(nn.Module):
    """3x3 SAME conv with the hand-written im2col-matmul backward for dw
    (ops.fast_conv). Wins in isolation but loses in the full B=1 step — the
    custom-VJP boundary forfeits XLA's global fusion (PERF.md round 2; use
    PatchConv3 instead, which has no boundary). Kept as a tested opt-in.
    Param names/shapes/inits identical to nn.Conv."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self, x):
        from plastic_unet_tpu.ops.fast_conv import conv3_same_fast

        kernel = self.param("kernel", torch_conv_kernel_init, (3, 3, self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(9 * self.in_features), (self.features,))
        return conv3_same_fast(x, kernel, bias)


class PatchConv3(nn.Module):
    """3x3 SAME conv as im2col + one matmul in the *forward* (ops.patch_conv)
    so autodiff emits matmul gradients with no custom-VJP boundary — the B=1
    backward fix that survives XLA's global fusion (PERF.md round 2). Param
    names/shapes/inits identical to nn.Conv; levels where the im2col form
    doesn't win (ops.patch_conv.worth_patching, a static shape gate) fall
    back to the plain XLA conv at call time. dtype: optional compute dtype
    (params stay fp32, like nn.Conv(dtype=...)) — the bf16 patch path is a
    throughput mode (same gates, bf16 matmuls)."""

    features: int
    in_features: int
    max_c: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from plastic_unet_tpu.ops.patch_conv import (
            conv3_same_patches,
            conv3_same_taps,
            worth_patching,
            worth_taps,
        )

        kernel = self.param("kernel", torch_conv_kernel_init, (3, 3, self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(9 * self.in_features), (self.features,))
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x = x.astype(self.dtype)
        h, w = x.shape[-3], x.shape[-2]
        b = int(math.prod(x.shape[:-3])) if x.ndim > 3 else 1
        if worth_patching(h, w, self.in_features, self.max_c, batch=b):
            return conv3_same_patches(x, kernel, bias)
        if worth_taps(h, w, self.in_features, self.max_c, batch=b):
            return conv3_same_taps(x, kernel, bias)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME", dimension_numbers=dn) + bias


class QuantConv3(nn.Module):
    """3x3 SAME conv with int8 serving quantization (ops.quant) — a serving
    EXTENSION above the bf16 path (the int8 MXU rate is 2x bf16 on v5e).
    Param names/shapes/inits identical to nn.Conv, so fp32 checkpoints load
    unchanged; the activation range lives in the 'quant' flax collection
    (variable "amax"), written in 'calib' mode (plain conv + running
    max(|input|)) and read in 'int8' mode (quantize -> int8 conv with int32
    accumulation -> fused dequant+bias)."""

    features: int
    in_features: int
    mode: str  # 'calib' | 'int8'
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from plastic_unet_tpu.ops.quant import qconv3_same

        kernel = self.param("kernel", torch_conv_kernel_init, (3, 3, self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(9 * self.in_features), (self.features,))
        amax = self.variable("quant", "amax", lambda: jnp.zeros((), jnp.float32))
        if self.mode == "calib":
            amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            if self.dtype is not None:
                x, kernel, bias = x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
            lead = x.shape[:-3]
            x4 = x.reshape((-1,) + x.shape[-3:])
            dn = jax.lax.conv_dimension_numbers(x4.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(x4, kernel, (1, 1), "SAME", dimension_numbers=dn) + bias
            return y.reshape(lead + y.shape[-3:])
        if self.mode != "int8":
            raise ValueError(f"unknown quant mode {self.mode!r} (want 'calib' or 'int8')")
        return qconv3_same(x, kernel, bias, amax.value,
                           out_dtype=self.dtype if self.dtype is not None else jnp.float32)


class QuantConvT3(nn.Module):
    """ConvTranspose k3/s2/VALID with int8 serving quantization (ops.quant).
    Param names/shapes/inits identical to nn.ConvTranspose(transpose_kernel=
    True); same calib/int8 contract as QuantConv3."""

    features: int
    in_features: int
    mode: str  # 'calib' | 'int8'
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from plastic_unet_tpu.ops.quant import qconvT3_s2_valid

        kernel = self.param("kernel", torch_convT_kernel_init, (3, 3, self.features, self.in_features))
        bias = self.param("bias", torch_bias_init(9 * self.features), (self.features,))
        amax = self.variable("quant", "amax", lambda: jnp.zeros((), jnp.float32))
        if self.mode == "calib":
            amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            if self.dtype is not None:
                x, kernel, bias = x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
            lead = x.shape[:-3]
            x4 = x.reshape((-1,) + x.shape[-3:])
            y = jax.lax.conv_transpose(
                x4, kernel, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            ) + bias
            return y.reshape(lead + y.shape[-3:])
        if self.mode != "int8":
            raise ValueError(f"unknown quant mode {self.mode!r} (want 'calib' or 'int8')")
        return qconvT3_s2_valid(x, kernel, bias, amax.value,
                                out_dtype=self.dtype if self.dtype is not None else jnp.float32)


def conv3_maybe_fast(features: int, in_features: int, fast: bool, dtype=None, name: str | None = None, patch_max_c: int = 0):
    """Select the conv implementation; explicit name keeps the param path at
    Conv_0 either way. patch_max_c > 0: route levels through PatchConv3
    (im2col forward where its static shape gate says it wins) — fp32 is the
    tested parity configuration; with a compute dtype set the patch runs as
    a bf16 throughput mode (same shape gates)."""
    if patch_max_c > 0:
        return PatchConv3(features, in_features, max_c=patch_max_c, dtype=dtype, name=name or "Conv_0")
    if fast and dtype is None:
        return FastConv3(features, in_features, name=name or "Conv_0")
    return conv3(features, in_features, name=name, dtype=dtype)


def conv1(features: int, in_features: int, name: str | None = None, dtype=None) -> nn.Conv:
    """1x1 conv with torch-default init."""
    return nn.Conv(
        features,
        (1, 1),
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_bias_init(in_features),
        name=name,
        dtype=dtype,
    )


# ---------------------------------------------------------------------------
# Spatial helpers
# ---------------------------------------------------------------------------

def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max-pool with floor (VALID) semantics — torch MaxPool2d(2)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="VALID")


def pad_to_match(x: jax.Array, target_h: int, target_w: int) -> jax.Array:
    """Pad/crop NHWC ``x`` to (target_h, target_w) with the reference's
    asymmetric arithmetic: left/top gets diff//2 (floor), right/bottom gets
    int(diff/2) (trunc toward zero). Negative diffs crop (torch F.pad with
    negative pad). Shapes are static, so this lowers to a static slice/pad."""
    h, w = x.shape[-3], x.shape[-2]
    dh, dw = target_h - h, target_w - w
    top, bottom = dh // 2, int(dh / 2)
    left, right = dw // 2, int(dw / 2)

    def apply(v, lo, hi, axis):
        if lo < 0:
            v = jax.lax.slice_in_dim(v, -lo, v.shape[axis], axis=axis)
            lo = 0
        if hi < 0:
            v = jax.lax.slice_in_dim(v, 0, v.shape[axis] + hi, axis=axis)
            hi = 0
        if lo or hi:
            cfg = [(0, 0)] * v.ndim
            cfg[axis] = (lo, hi)
            v = jnp.pad(v, cfg)
        return v

    x = apply(x, top, bottom, x.ndim - 3)
    x = apply(x, left, right, x.ndim - 2)
    return x


def channel_dropout(x: jax.Array, rate: float, deterministic: bool, rng=None) -> jax.Array:
    """torch Dropout2d: drop whole channels (broadcast over H, W)."""
    if deterministic or rate == 0.0:
        return x
    # broadcast over the two spatial dims (works batched or unbatched)
    dims = (x.ndim - 3, x.ndim - 2)
    return nn.Dropout(rate=rate, broadcast_dims=dims, deterministic=False)(x, rng=rng)


# ---------------------------------------------------------------------------
# Residual-family blocks (UNetPRes, reference unet_p_res.py:142-272)
# ---------------------------------------------------------------------------

class FoldedConv3(nn.Module):
    """3x3 'same' conv executed in 2x2 space-to-depth folded space
    (ops.space_to_depth) — numerically equivalent to conv3 on the unfolded
    tensor, but at 4x the channel width for MXU lane utilization (PERF.md).
    Parameters are stored in the ordinary (3,3,in,out) layout under the same
    names as nn.Conv, so checkpoints/optimizer state are interchangeable
    with the unfolded path."""

    features: int
    in_features: int
    mask_pad: tuple = (False, False)  # re-zero pad row/col (odd-size levels)
    dtype: object = None

    @nn.compact
    def __call__(self, z):
        from plastic_unet_tpu.ops.space_to_depth import folded_conv3, mask_pad_folded

        kernel = self.param("kernel", torch_conv_kernel_init, (3, 3, self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(9 * self.in_features), (self.features,))
        if self.dtype is not None:
            z, kernel, bias = z.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        y = folded_conv3(z, kernel, bias)
        return mask_pad_folded(y, self.features, *self.mask_pad)


class ConvModule(nn.Module):
    """conv3x3 [+BN] [+ReLU] (reference conv_module, unet_p_res.py:142-164).
    In/out channel counts are equal by construction in the reference."""

    features: int
    activation: bool = True
    batch_norm: bool = False
    dtype: object = None
    folded: bool = False
    mask_pad: tuple = (False, False)
    fast_vjp: bool = False
    patch_max_c: int = 0
    quant: str = ""  # '' | 'calib' | 'int8' (serving PTQ, see QuantConv3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quant:
            x = QuantConv3(self.features, self.features, mode=self.quant, dtype=self.dtype, name="Conv_0")(x)
        elif self.folded:
            if self.batch_norm:
                raise NotImplementedError("batch_norm is not supported in folded mode")
            x = FoldedConv3(self.features, self.features, self.mask_pad, self.dtype, name="Conv_0")(x)
        else:
            x = conv3_maybe_fast(self.features, self.features, self.fast_vjp, dtype=self.dtype, patch_max_c=self.patch_max_c)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        if self.activation:
            x = nn.relu(x)
        return x


class ResidualBlock(nn.Module):
    """ReLU [+BN] -> conv_module -> conv_module(no act), + skip
    (reference residual_block, unet_p_res.py:166-189).

    Fidelity quirk: the reference's leading ``nn.ReLU(inplace=True)``
    mutates the block *input* tensor, so the residual skip it later adds
    (unet_p_res.py:188) is actually ``relu(input)``, not ``input``.
    Reproduced here — verified against torch in tests/test_model_parity.py."""

    features: int
    batch_norm: bool = False
    dtype: object = None
    folded: bool = False
    mask_pad: tuple = (False, False)
    fast_vjp: bool = False
    patch_max_c: int = 0
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(x)  # the inplace ReLU side effect: skip becomes relu(x)
        y = h
        if self.batch_norm:
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = ConvModule(
            self.features, batch_norm=self.batch_norm, dtype=self.dtype,
            folded=self.folded, mask_pad=self.mask_pad, fast_vjp=self.fast_vjp,
            patch_max_c=self.patch_max_c, quant=self.quant,
        )(y, train)
        y = ConvModule(
            self.features, activation=False, batch_norm=self.batch_norm, dtype=self.dtype,
            folded=self.folded, mask_pad=self.mask_pad, fast_vjp=self.fast_vjp,
            patch_max_c=self.patch_max_c, quant=self.quant,
        )(y, train)
        return y + h


class _RawConvParams(nn.Module):
    """Declares an nn.Conv's parameters (same names, shapes, inits) without
    building the conv — lets the fused Pallas tail own the compute while the
    param tree stays byte-identical to the XLA path (checkpoint/torch-interop
    compatible, and identical init streams since flax derives param RNGs from
    the path)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_conv_kernel_init, (3, 3, self.in_features, self.features))
        bias = self.param("bias", torch_bias_init(9 * self.in_features), (self.features,))
        return kernel, bias


class _ConvModuleParams(nn.Module):
    """Param tree of one ConvModule (Conv_0/{kernel,bias})."""

    features: int

    @nn.compact
    def __call__(self):
        return _RawConvParams(self.features, self.features, name="Conv_0")()


class _ResidualBlockParams(nn.Module):
    """Param tree of one ResidualBlock (ConvModule_0/Conv_0, ConvModule_1/Conv_0)."""

    features: int

    @nn.compact
    def __call__(self):
        k1 = _ConvModuleParams(self.features, name="ConvModule_0")()
        k2 = _ConvModuleParams(self.features, name="ConvModule_1")()
        return k1, k2


def _use_fused_tail(x, features: int) -> bool:
    """Static per-level gate for the fused Pallas tail (see
    ops.pallas_trunk.worth_fusing)."""
    from plastic_unet_tpu.ops.pallas_trunk import worth_fusing

    return worth_fusing(x.shape[-3], x.shape[-2], features)


def _fused_tail(parent: nn.Module, x, features: int):
    """Run the two ResidualBlocks + final ReLU through the fused Pallas
    kernel (ops.pallas_trunk) at B=1 fp32; declares params under the exact
    same paths as the unfused ResidualBlock modules."""
    from plastic_unet_tpu.ops.pallas_trunk import residual_tail_apply

    (w11, b11), (w12, b12) = _ResidualBlockParams(features, name="ResidualBlock_0", parent=parent)()
    (w21, b21), (w22, b22) = _ResidualBlockParams(features, name="ResidualBlock_1", parent=parent)()
    p = {"w11": w11, "b11": b11, "w12": w12, "b12": b12,
         "w21": w21, "b21": b21, "w22": w22, "b22": b22}
    h, w = x.shape[-3], x.shape[-2]
    if x.ndim == 4:
        # per-sample kernel; B=1 is the target (parity mode). vmap covers B>1.
        if x.shape[0] == 1:
            return residual_tail_apply(x[0], p, h, w, features)[None]
        return jax.vmap(lambda xi: residual_tail_apply(xi, p, h, w, features))(x)
    return residual_tail_apply(x, p, h, w, features)


class DownRes(nn.Module):
    """conv3x3 -> 2x residual -> ReLU (reference down, unet_p_res.py:256-272;
    identical structure to middle, unet_p_res.py:223-238). With folded=True
    the whole level runs in 2x2 space-to-depth space (input/output folded).
    fuse_tail=True routes the residual tail through the fused Pallas kernel
    (B=1 fp32 parity mode; see ops.pallas_trunk)."""

    in_features: int
    features: int
    batch_norm: bool = False
    dtype: object = None
    folded: bool = False
    mask_pad: tuple = (False, False)
    fuse_tail: bool = False
    fast_vjp: bool = False
    patch_max_c: int = 0
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quant:
            x = QuantConv3(self.features, self.in_features, mode=self.quant, dtype=self.dtype, name="Conv_0")(x)
        elif self.folded:
            x = FoldedConv3(self.features, self.in_features, self.mask_pad, self.dtype, name="Conv_0")(x)
        else:
            x = conv3_maybe_fast(self.features, self.in_features, self.fast_vjp, dtype=self.dtype, patch_max_c=self.patch_max_c)(x)
        if (self.fuse_tail and not self.batch_norm and self.dtype is None
                and not self.folded and not self.quant and _use_fused_tail(x, self.features)):
            return _fused_tail(self, x, self.features)
        x = ResidualBlock(self.features, self.batch_norm, dtype=self.dtype, folded=self.folded, mask_pad=self.mask_pad, fast_vjp=self.fast_vjp, patch_max_c=self.patch_max_c, quant=self.quant)(x, train)
        x = ResidualBlock(self.features, self.batch_norm, dtype=self.dtype, folded=self.folded, mask_pad=self.mask_pad, fast_vjp=self.fast_vjp, patch_max_c=self.patch_max_c, quant=self.quant)(x, train)
        return nn.relu(x)


class Middle(nn.Module):
    """Same trunk as DownRes (reference middle, unet_p_res.py:223-238)."""

    in_features: int
    features: int
    batch_norm: bool = False
    dtype: object = None
    folded: bool = False
    mask_pad: tuple = (False, False)
    fuse_tail: bool = False
    fast_vjp: bool = False
    patch_max_c: int = 0
    quant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quant:
            x = QuantConv3(self.features, self.in_features, mode=self.quant, dtype=self.dtype, name="Conv_0")(x)
        elif self.folded:
            x = FoldedConv3(self.features, self.in_features, self.mask_pad, self.dtype, name="Conv_0")(x)
        else:
            x = conv3_maybe_fast(self.features, self.in_features, self.fast_vjp, dtype=self.dtype, patch_max_c=self.patch_max_c)(x)
        if (self.fuse_tail and not self.batch_norm and self.dtype is None
                and not self.folded and not self.quant and _use_fused_tail(x, self.features)):
            return _fused_tail(self, x, self.features)
        x = ResidualBlock(self.features, self.batch_norm, dtype=self.dtype, folded=self.folded, mask_pad=self.mask_pad, fast_vjp=self.fast_vjp, patch_max_c=self.patch_max_c, quant=self.quant)(x, train)
        x = ResidualBlock(self.features, self.batch_norm, dtype=self.dtype, folded=self.folded, mask_pad=self.mask_pad, fast_vjp=self.fast_vjp, patch_max_c=self.patch_max_c, quant=self.quant)(x, train)
        return nn.relu(x)


class PatchConvT3(nn.Module):
    """ConvTranspose k3/s2/VALID as parity-phase im2col matmuls
    (ops.patch_conv.convT3_s2_valid_patches) — same B=1 dw fix as PatchConv3,
    for the decoder's upsampling convs. Param names/shapes/inits identical to
    nn.ConvTranspose(transpose_kernel=True)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self, x):
        from plastic_unet_tpu.ops.patch_conv import convT3_s2_valid_patches

        kernel = self.param(
            "kernel", torch_convT_kernel_init, (3, 3, self.features, self.in_features)
        )
        bias = self.param("bias", torch_bias_init(9 * self.features), (self.features,))
        return convT3_s2_valid_patches(x, kernel, bias)


class UpRes(nn.Module):
    """ConvT(k3,s2,VALID) -> pad/crop to skip -> concat[x, skip] ->
    channel-dropout -> middle (reference up, unet_p_res.py:200-220).
    Note the inner middle never uses batch_norm (hard-coded False at
    unet_p_res.py:210)."""

    in_features: int
    features: int
    dropout_ratio: float
    dtype: object = None
    fold_middle: bool = False  # run the inner middle in space-to-depth space
    fuse_tail: bool = False  # fused Pallas residual tail (B=1 fp32)
    fast_vjp: bool = False  # hand-written dw backward for the 3x3 convs
    patch_max_c: int = 0  # im2col-forward convs for levels with Cin <= this
    quant: str = ""  # '' | 'calib' | 'int8' (serving PTQ)

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        use_patch_t = False
        if self.patch_max_c > 0 and self.dtype is None:
            from plastic_unet_tpu.ops.patch_conv import worth_patching_convT

            use_patch_t = worth_patching_convT(
                2 * x.shape[-3] + 1, 2 * x.shape[-2] + 1, x.shape[-1], self.patch_max_c
            )
        if self.quant:
            x = QuantConvT3(self.features, x.shape[-1], mode=self.quant, dtype=self.dtype, name="ConvTranspose_0")(x)
        elif use_patch_t:
            x = PatchConvT3(self.features, x.shape[-1], name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                transpose_kernel=True,
                kernel_init=torch_convT_kernel_init,
                bias_init=torch_bias_init(9 * self.features),
                dtype=self.dtype,
            )(x)
        x = pad_to_match(x, skip.shape[-3], skip.shape[-2])
        x = jnp.concatenate([x, skip], axis=-1)
        x = channel_dropout(x, self.dropout_ratio, deterministic=not train)
        if self.fold_middle:
            from plastic_unet_tpu.ops.space_to_depth import crop_hw, fold2, pad_to_even, unfold2

            h, w = x.shape[-3], x.shape[-2]
            pad = (bool(h % 2), bool(w % 2))
            z = fold2(pad_to_even(x))
            z = Middle(
                self.in_features, self.features, batch_norm=False, dtype=self.dtype,
                folded=True, mask_pad=pad,
            )(z, train)
            return crop_hw(unfold2(z, self.features), h, w)
        return Middle(
            self.in_features, self.features, batch_norm=False, dtype=self.dtype,
            fuse_tail=self.fuse_tail, fast_vjp=self.fast_vjp, patch_max_c=self.patch_max_c,
            quant=self.quant,
        )(x, train)


# ---------------------------------------------------------------------------
# Classic-family blocks (UNetP, reference unet_p.py:96-261)
# ---------------------------------------------------------------------------

class DoubleConv(nn.Module):
    """(conv3 [+BN] ReLU) x2 (reference double_conv, unet_p.py:96-122)."""

    in_features: int
    features: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3(self.features, self.in_features)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = conv3(self.features, self.features)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


def bilinear_upsample_2x_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample with align_corners=True (torch nn.Upsample,
    unet_p.py:153). Implemented as two 1-D interpolation matmuls so the work
    lands on the MXU instead of a gather."""

    def interp_matrix(n_in: int, n_out: int, dtype):
        if n_in == 1:
            return jnp.ones((n_out, 1), dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        frac = pos - lo.astype(jnp.float32)
        m = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        m = m.at[rows, lo].set(1.0 - frac)
        m = m.at[rows, lo + 1].add(frac)
        return m.astype(dtype)

    h, w = x.shape[-3], x.shape[-2]
    mh = interp_matrix(h, 2 * h, x.dtype)
    mw = interp_matrix(w, 2 * w, x.dtype)
    x = jnp.einsum("Oh,...hwc->...Owc", mh, x)
    x = jnp.einsum("Ow,...hwc->...hOc", mw, x)
    return x


class UpClassic(nn.Module):
    """Upsample (bilinear align-corners | ConvT k2 s2) -> pad/crop SKIP to x
    -> concat[skip, x] -> double_conv (reference up, unet_p.py:148-167).
    Note: unlike UpRes, here the *skip* is padded/cropped to the upsampled x,
    and the concat order is [skip, x]."""

    in_features: int  # channels after concat
    features: int
    bilinear: bool = True
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.bilinear:
            x = bilinear_upsample_2x_align_corners(x)
        else:
            ch = self.in_features // 2
            x = nn.ConvTranspose(
                ch,
                (2, 2),
                strides=(2, 2),
                padding="VALID",
                transpose_kernel=True,
                kernel_init=torch_convT_kernel_init,
                bias_init=torch_bias_init(4 * ch),
            )(x)
        skip = pad_to_match(skip, x.shape[-3], x.shape[-2])
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.in_features, self.features, self.batch_norm)(x, train)
