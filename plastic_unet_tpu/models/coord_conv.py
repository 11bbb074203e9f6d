"""CoordConv U-Net — the third model family (the reference's independent
Keras/TF solution, src/coord_conv_script.py:104-200), rebuilt as a Flax
module on the same TPU stack.

Structure (coord_conv_script.py:146-200): input/255 -> CoordConv stem
(AddCoords + 1x1 conv, 8 filters, ReLU) -> classic 4-level U-Net with
channel widths 8/16/32/64/128, 2x2 maxpools, ConvT(k2,s2,'SAME') ups with
skip concats, double 3x3 'same' ReLU convs per level -> 1x1 sigmoid output.

Initializers follow Keras defaults (glorot_uniform kernels, zero biases) so
train-from-scratch matches the reference's init distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from plastic_unet_tpu.ops.coords import add_coords

_glorot = nn.initializers.glorot_uniform()


def _conv(f, k=(3, 3), **kw):
    return nn.Conv(f, k, padding="SAME", kernel_init=_glorot, **kw)


class CoordConvUNet(nn.Module):
    """CoordConv U-Net (reference construct_model, coord_conv_script.py:146-200)."""

    im_chan: int = 1
    with_r: bool = False
    scale_input: bool = True  # the Lambda(x/255) layer (coord_conv_script.py:149)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 3:
            x = x[None]
        s = x / 255.0 if self.scale_input else x

        # CoordConv stem: AddCoords + 1x1 conv (8 filters, relu)
        cc1 = nn.relu(_conv(8, (1, 1))(add_coords(s, self.with_r)))

        c1 = nn.relu(_conv(8)(cc1))
        c1 = nn.relu(_conv(8)(c1))
        p1 = nn.max_pool(c1, (2, 2), strides=(2, 2))

        c2 = nn.relu(_conv(16)(p1))
        c2 = nn.relu(_conv(16)(c2))
        p2 = nn.max_pool(c2, (2, 2), strides=(2, 2))

        c3 = nn.relu(_conv(32)(p2))
        c3 = nn.relu(_conv(32)(c3))
        p3 = nn.max_pool(c3, (2, 2), strides=(2, 2))

        c4 = nn.relu(_conv(64)(p3))
        c4 = nn.relu(_conv(64)(c4))
        p4 = nn.max_pool(c4, (2, 2), strides=(2, 2))

        c5 = nn.relu(_conv(128)(p4))
        c5 = nn.relu(_conv(128)(c5))

        def up(c, skip, f):
            u = nn.ConvTranspose(f, (2, 2), strides=(2, 2), padding="SAME", kernel_init=_glorot)(c)
            u = jnp.concatenate([u, skip], axis=-1)
            u = nn.relu(_conv(f)(u))
            return nn.relu(_conv(f)(u))

        c6 = up(c5, c4, 64)
        c7 = up(c6, c3, 32)
        c8 = up(c7, c2, 16)
        c9 = up(c8, c1, 8)

        logits = nn.Conv(1, (1, 1), kernel_init=_glorot)(c9)
        return nn.sigmoid(logits)  # (B, H, W, 1)
