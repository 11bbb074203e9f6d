"""UNetP — classic plastic U-Net.

Behavioral equivalent of reference UNetp (src/unet/unet_p.py:8-94):
inconv(->8) then down1..4 (8->16->32->64->64) via maxpool+double_conv,
up1..4 with skip concats (concat order [skip, x], unet_p.py:165), 1x1
outconv, then the identical plastic head.

Geometry note (preserved): with the default non-bilinear path the upsampled
map doubles exactly (k2 s2), so skips are *cropped* to the upsampled size
when the input isn't divisible by 16; at 101 px the output is 96x96 and the
(nbf, nbf) reshape fails — exactly as in the reference, which only ever runs
UNetp at 128 px. Use 128-px (or any /16) inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from plastic_unet_tpu.models.blocks import DoubleConv, UpClassic, conv1, max_pool_2x2
from plastic_unet_tpu.models.unet_res import PlasticOutput
from plastic_unet_tpu.ops import plasticity


class UNetP(nn.Module):
    """Classic plastic U-Net (reference unet_p.py:8-94)."""

    n_channels: int = 1
    n_classes: int = 1
    alfa_type: str = "free"
    rule: str = "hebb"
    nbf: int = 128
    batch_norm: bool = False
    bilinear_upsample: bool = False
    use_pallas: bool = False

    def initial_zero_hebb(self, batch: int = 1, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch, self.nbf, self.nbf), dtype=dtype)

    @nn.compact
    def __call__(self, x: jax.Array, hebb: jax.Array, train: bool = False) -> PlasticOutput:
        if x.ndim == 3:
            x = x[None]
            hebb = hebb[None] if hebb.ndim == 2 else hebb

        w = self.param("w", lambda k, s: 0.01 * jax.random.normal(k, s), (self.nbf, self.nbf))
        alpha = self.param("alpha", lambda k, s: 0.01 * jax.random.uniform(k, s), (self.nbf, self.nbf))
        eta = self.param("eta", lambda k, s: 0.01 * jnp.ones(s), (1,))
        pparams = plasticity.PlasticParams(w=w, alpha=alpha, eta=eta)

        bn = self.batch_norm
        x1 = DoubleConv(self.n_channels, 8, bn)(x, train)  # inconv
        x2 = DoubleConv(8, 16, bn)(max_pool_2x2(x1), train)  # down1
        x3 = DoubleConv(16, 32, bn)(max_pool_2x2(x2), train)  # down2
        x4 = DoubleConv(32, 64, bn)(max_pool_2x2(x3), train)  # down3
        x5 = DoubleConv(64, 64, bn)(max_pool_2x2(x4), train)  # down4

        u = UpClassic(128, 32, self.bilinear_upsample, bn)(x5, x4, train)
        u = UpClassic(64, 16, self.bilinear_upsample, bn)(u, x3, train)
        u = UpClassic(32, 8, self.bilinear_upsample, bn)(u, x2, train)
        u = UpClassic(16, 8, self.bilinear_upsample, bn)(u, x1, train)
        out = conv1(self.n_classes, 8)(u)

        b = out.shape[0]
        if out.size != b * self.nbf * self.nbf:
            raise ValueError(
                "UNetP output (%s) cannot be reshaped to (B, nbf=%d, nbf); "
                "UNetP requires inputs divisible by 16 (e.g. 128 px), as in "
                "the reference" % (out.shape, self.nbf)
            )
        activin = out.reshape(b, self.nbf, self.nbf)

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
