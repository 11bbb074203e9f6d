"""UNetPRes — residual plastic U-Net (the flagship model; the one the
reference's train/eval/infer drivers instantiate).

Behavioral equivalent of reference UNetpRes (src/unet/unet_p_res.py:9-140):
encoder 4x(down + pool/channel-dropout), middle bottleneck, decoder 4x up
with skip concats, 1x1 outconv, then the plastic head
(activin @ (w + alpha*hebb) -> sigmoid -> trace update). Channel widths are
neurons x {1,2,4,8,16} (unet_p_res.py:38-63); the 101-px spatial track is
101 -> 50 -> 25 -> 12 -> 6 -> (up) -> 101. The first pool uses
dropout_ratio/2 (unet_p_res.py:39).

TPU-native deviations (documented, parity-preserving at B=1):
  * NHWC layout; inputs are batched (B, H, W, C) and the hebb trace is
    (B, nbf, nbf) — one independent lifetime stream per batch lane. The
    reference's batch-size-1 restriction is a limitation, not a semantic;
    B=1 reproduces it exactly, B>1 enables stream-parallel throughput.
  * The plastic head can run as a fused Pallas kernel (ops/pallas_plastic)
    or the XLA fallback (ops/plasticity); both are tested equal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from plastic_unet_tpu.models.blocks import DownRes, Middle, UpRes, channel_dropout, conv1, max_pool_2x2
from plastic_unet_tpu.ops import plasticity


class PlasticOutput(NamedTuple):
    activ: jax.Array  # pre-sigmoid logits of the plastic head (B, nbf, nbf)
    activout: jax.Array  # sigmoid probabilities == predicted mask (B, nbf, nbf)
    hebb: jax.Array  # updated trace (B, nbf, nbf)


class UNetPRes(nn.Module):
    """Residual plastic U-Net. Constructor args mirror the reference's
    (unet_p_res.py:10) minus the torch device."""

    n_channels: int = 1
    n_classes: int = 1
    neurons: int = 16
    dropout_ratio: float = 0.5
    alfa_type: str = "free"
    rule: str = "hebb"
    nbf: int = 128
    batch_norm: bool = False
    bilinear_upsample: bool = False  # accepted for API parity; unused, as in the reference
    use_pallas: bool = False  # route the plastic head through the Pallas kernel
    compute_dtype: object = None  # e.g. jnp.bfloat16 for MXU-native mixed precision
    fold_hires: bool = False  # space-to-depth the thin-channel high-res levels (PERF.md)
    pallas_trunk: bool = False  # fused Pallas residual tails (B=1 fp32 parity mode; PERF.md)
    fast_dw: bool = False  # hand-written im2col dw backward for 3x3 convs (ops/fast_conv)
    patch_conv: int = 0  # im2col-FORWARD 3x3 convs for fp32 levels with Cin <= this (ops/patch_conv)
    plastic: bool = True  # False = vanilla U-Net (sigmoid on trunk logits, no head)
    coord_conv: bool = False  # inject CoordConv xx/yy channels at the stem (extension)
    remat_trunk: bool = False  # jax.checkpoint every trunk block: the backward
    # recomputes block-internal activations instead of reading them from HBM
    # (the TPU-native HBM <-> FLOPs trade). Bit-identical grads — the replayed
    # ops are deterministic and dropout rngs are replayed by nn.remat — so it
    # is parity-safe; use it to fit larger lane counts / nbf in HBM.
    quant: str = ""  # int8 serving PTQ: '' off | 'calib' (fp32 forward that
    # records per-conv activation ranges into the mutable 'quant' collection)
    # | 'int8' (every trunk 3x3 conv and decoder ConvTranspose runs as an
    # int8 conv with int32 accumulation — 2x MXU rate on v5e — using the
    # calibrated ranges; 1x1 outconv and the plastic head stay fp32). A
    # serving EXTENSION (the reference serves fp32 only, infer.py); params
    # are UNCHANGED, apply with {'params': ..., 'quant': ...}. See
    # ops/quant.py and submit/quant.py.
    trunk_pad: int = 0  # MXU-aligned padded trunk (VERDICT r02 item 2): pad the
    # input spatially to (trunk_pad, trunk_pad) — e.g. 101 -> 128 — so every
    # level runs on power-of-two tracks (128/64/32/16/8 instead of the
    # tile-hostile 101/50/25/12/6), then center-crop the trunk logits back to
    # (nbf, nbf) for the plastic head. A documented throughput/geometry
    # EXTENSION, not parity: receptive fields and FLOPs change ((128/101)^2 =
    # 1.6x more conv work), so quality must be validated by the
    # PARITY_QUALITY showdown protocol. 0 = off (reference geometry).

    def initial_zero_hebb(self, batch: int = 1, dtype=jnp.float32) -> jax.Array:
        """Batched zero trace (reference initialZeroHebb, unet_p_res.py:136)."""
        return jnp.zeros((batch, self.nbf, self.nbf), dtype=dtype)

    @nn.compact
    def __call__(self, x: jax.Array, hebb: jax.Array, train: bool = False) -> PlasticOutput:
        if x.ndim == 3:  # allow unbatched convenience input
            x = x[None]
            hebb = hebb[None] if hebb.ndim == 2 else hebb
        if self.quant:
            if self.quant not in ("calib", "int8"):
                raise ValueError(f"quant must be '', 'calib' or 'int8', got {self.quant!r}")
            bad = [k for k, v in (("fold_hires", self.fold_hires), ("pallas_trunk", self.pallas_trunk),
                                  ("fast_dw", self.fast_dw), ("patch_conv", self.patch_conv),
                                  ("batch_norm", self.batch_norm), ("trunk_pad", self.trunk_pad),
                                  ("remat_trunk", self.remat_trunk)) if v]
            if bad:
                raise ValueError(f"quant={self.quant!r} is a plain serving mode; incompatible with {bad}")
        n = self.neurons

        if self.plastic:
            # Plastic parameters (reference init distributions, unet_p_res.py:32-34)
            w = self.param("w", lambda k, s: 0.01 * jax.random.normal(k, s), (self.nbf, self.nbf))
            alpha = self.param("alpha", lambda k, s: 0.01 * jax.random.uniform(k, s), (self.nbf, self.nbf))
            eta = self.param("eta", lambda k, s: 0.01 * jnp.ones(s), (1,))
            pparams = plasticity.PlasticParams(w=w, alpha=alpha, eta=eta)

        pad_crop = 0
        if self.trunk_pad:
            h0, w0 = x.shape[-3], x.shape[-2]
            if h0 > self.trunk_pad or w0 > self.trunk_pad:
                raise ValueError(
                    f"trunk_pad={self.trunk_pad} smaller than input {h0}x{w0}"
                )
            if h0 != w0:
                # pad_to/crop_from restore a SQUARE (size, size) geometry and
                # the plastic head needs (nbf, nbf) — reject non-square tiles
                # here rather than silently mis-cropping the width.
                raise ValueError(
                    f"trunk_pad requires square inputs, got {h0}x{w0}"
                )
            if h0 < self.trunk_pad or w0 < self.trunk_pad:
                # reflect padding requires per-side width < input size; the
                # widest side pad_to emits is ceil((trunk_pad - h0)/2), so the
                # largest legal target is 3*h0 - 2. Validate here for a clear
                # error instead of an obscure XLA pad failure at trace time.
                if self.trunk_pad > 3 * h0 - 2:
                    raise ValueError(
                        f"trunk_pad={self.trunk_pad} too large for {h0}x{w0} "
                        f"input: reflect padding supports at most {3 * h0 - 2}"
                    )
                from plastic_unet_tpu.ops.augment import pad_to

                x = pad_to(x, self.trunk_pad, mode="reflect")
                pad_crop = h0

        n_in = self.n_channels
        if self.coord_conv:
            from plastic_unet_tpu.ops.coords import add_coords

            x = add_coords(x)
            n_in = self.n_channels + 2

        det = not train
        dt = self.compute_dtype
        if dt is not None:
            x = x.astype(dt)

        # remat_trunk: checkpoint each block (train is shape-static -> static_argnums;
        # flax counts self as argnum 0)
        DownResB, MiddleB, UpResB = DownRes, Middle, UpRes
        if self.remat_trunk:
            DownResB = nn.remat(DownRes, static_argnums=(2,))
            MiddleB = nn.remat(Middle, static_argnums=(2,))
            UpResB = nn.remat(UpRes, static_argnums=(3,))

        # Encoder: 101 -> 50 -> 25 -> 12 -> 6. With fold_hires, the two
        # thin-channel high-res levels run in 2x2 space-to-depth space
        # (numerically equivalent; see ops.space_to_depth and PERF.md).
        if self.fold_hires:
            from plastic_unet_tpu.ops.space_to_depth import crop_hw, fold2, pad_to_even, pool_phases, unfold2

            h0, w0 = x.shape[-3], x.shape[-2]
            pad0 = (bool(h0 % 2), bool(w0 % 2))
            z1 = fold2(pad_to_even(x))
            z1 = DownResB(n_in, n, self.batch_norm, dtype=dt, folded=True, mask_pad=pad0, name="DownRes_0")(z1, train)
            xc1 = crop_hw(unfold2(z1, n), h0, w0)
            x1 = channel_dropout(crop_hw(pool_phases(z1, n), h0 // 2, w0 // 2), self.dropout_ratio / 2, det)

            h1, w1 = x1.shape[-3], x1.shape[-2]
            pad1 = (bool(h1 % 2), bool(w1 % 2))
            z2 = fold2(pad_to_even(x1))
            z2 = DownResB(n, n * 2, self.batch_norm, dtype=dt, folded=True, mask_pad=pad1, name="DownRes_1")(z2, train)
            xc2 = crop_hw(unfold2(z2, n * 2), h1, w1)
            x2 = channel_dropout(crop_hw(pool_phases(z2, n * 2), h1 // 2, w1 // 2), self.dropout_ratio, det)
        else:
            xc1 = DownResB(n_in, n, self.batch_norm, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="DownRes_0")(x, train)
            x1 = channel_dropout(max_pool_2x2(xc1), self.dropout_ratio / 2, det)
            xc2 = DownResB(n, n * 2, self.batch_norm, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="DownRes_1")(x1, train)
            x2 = channel_dropout(max_pool_2x2(xc2), self.dropout_ratio, det)
        xc3 = DownResB(n * 2, n * 4, self.batch_norm, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="DownRes_2")(x2, train)
        x3 = channel_dropout(max_pool_2x2(xc3), self.dropout_ratio, det)
        xc4 = DownResB(n * 4, n * 8, self.batch_norm, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="DownRes_3")(x3, train)
        x4 = channel_dropout(max_pool_2x2(xc4), self.dropout_ratio, det)

        # Middle
        x5 = MiddleB(n * 8, n * 16, self.batch_norm, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="Middle_0")(x4, train)

        # Decoder: 6 -> 12 -> 25 -> 50 -> 101 (fold the two high-res middles)
        u = UpResB(n * 16, n * 8, self.dropout_ratio, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="UpRes_0")(x5, xc4, train)
        u = UpResB(n * 8, n * 4, self.dropout_ratio, dtype=dt, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="UpRes_1")(u, xc3, train)
        u = UpResB(n * 4, n * 2, self.dropout_ratio, dtype=dt, fold_middle=self.fold_hires, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="UpRes_2")(u, xc2, train)
        u = UpResB(n * 2, n * 1, self.dropout_ratio, dtype=dt, fold_middle=self.fold_hires, fuse_tail=self.pallas_trunk, fast_vjp=self.fast_dw, patch_max_c=self.patch_conv, quant=self.quant, name="UpRes_3")(u, xc1, train)

        out = conv1(self.n_classes, n, dtype=dt)(u)  # (B, H, W, n_classes)
        if dt is not None:
            out = out.astype(jnp.float32)  # plastic head + loss stay fp32
        if pad_crop:
            from plastic_unet_tpu.ops.augment import crop_from

            out = crop_from(out, pad_crop)  # back to the (nbf, nbf) head geometry

        b = out.shape[0]
        if out.size != b * self.nbf * self.nbf:
            raise ValueError(
                "U-Net output (%s) cannot be reshaped to (B, nbf=%d, nbf); "
                "nbf must equal the image width (reference sets nbf=img_width, "
                "train.py:285-288)" % (out.shape, self.nbf)
            )
        activin = out.reshape(b, self.nbf, self.nbf)

        if not self.plastic:
            # vanilla U-Net: sigmoid directly on the trunk logits; the trace
            # passes through untouched (BASELINE.json config #1)
            return PlasticOutput(activ=activin, activout=jax.nn.sigmoid(activin), hebb=hebb)

        if self.use_pallas:
            from plastic_unet_tpu.ops.pallas_plastic import plastic_head_pallas_batched

            activ, activout, new_hebb = plastic_head_pallas_batched(
                pparams, activin, hebb, rule=self.rule, alfa_type=self.alfa_type
            )
        else:
            head = lambda a, h: plasticity.plastic_head_logits(
                pparams, a, h, rule=self.rule, alfa_type=self.alfa_type
            )
            activ, activout, new_hebb = jax.vmap(head)(activin, hebb)

        return PlasticOutput(activ=activ, activout=activout, hebb=new_hebb)
