"""CoordConv coordinate-channel injection (device-side, jit-fused).

Behavioral equivalent of the reference Keras AddCoords layer
(src/coord_conv_script.py:61-102): appends xx (varies along width) and yy
(varies along height) channels normalized to [-1, 1], plus an optional
radius channel r = sqrt((xx-.5)^2 + (yy-.5)^2) — the -0.5 offsets applied to
the already-[-1,1]-normalized channels are a reference quirk, preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_coords(x: jax.Array, with_r: bool = False) -> jax.Array:
    """Append coordinate channels to NHWC (or HWC) input."""
    h, w = x.shape[-3], x.shape[-2]
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # column index
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)  # row index
    xx = (xx / (w - 1)) * 2.0 - 1.0
    yy = (yy / (h - 1)) * 2.0 - 1.0
    chans = [xx, yy]
    if with_r:
        chans.append(jnp.sqrt(jnp.square(xx - 0.5) + jnp.square(yy - 0.5)))
    coords = jnp.stack(chans, axis=-1).astype(x.dtype)  # (H, W, 2|3)
    coords = jnp.broadcast_to(coords, x.shape[:-1] + (coords.shape[-1],))
    return jnp.concatenate([x, coords], axis=-1)
