"""Space-to-depth (2x2) folding for thin-channel high-res convolutions.

Motivation (PERF.md): on TPU, a stride-1 3x3 conv maps output channels to
the 128-wide MXU lane axis, so the reference architecture's C=16/32 high-res
levels run at 12.5%/25% lane utilization and dominate step time. Folding
2x2 spatial blocks into channels (H, W, C) -> (H/2, W/2, 4C) turns them into
4x-wider convs at a quarter of the spatial positions.

Equivalence (exact up to fp reassociation): a SAME 3x3 conv with kernel
W (3,3,C,K) on the even-sized image equals, in folded space, a SAME 3x3 conv
with the sparse embedded kernel Wf (3,3,4C,4K):

    y[2i+qi, 2j+qj, k] = sum_{di,dj,c} W[di,dj,c,k] x[2i+qi+di-1, 2j+qj+dj-1, c]
    index split: qi+di-1 = 2*si + pi  with  si in {-1,0,1}, pi in {0,1}
    =>  Wf[si+1, sj+1, pi*2+pj :: phase, c, k-block qi*2+qj] = W[di,dj,c,k]
        where di = 2*si + pi - qi + 1, valid iff di in {0,1,2}

Phase layout: channel index = p*C + c with p = 2*pi + pj (row-major phases).
Each original weight appears exactly once per output phase (density 1/4).

MaxPool2x2/stride-2 in folded space is simply the max over the 4 phases,
yielding the UNFOLDED pooled tensor directly.

Verified against the direct conv in tests/test_space_to_depth.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fold2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); H, W must be even.
    Channel layout: [p0|p1|p2|p3] blocks of C, p = 2*pi + pj."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # (B, H/2, W/2, pi, pj, C) -> (B, H/2, W/2, 4, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4, c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unfold2(z: jax.Array, c: int) -> jax.Array:
    """Inverse of fold2: (B, H/2, W/2, 4C) -> (B, H, W, C)."""
    b, h2, w2, _ = z.shape
    z = z.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, h2 * 2, w2 * 2, c)


def pool_phases(z: jax.Array, c: int) -> jax.Array:
    """MaxPool 2x2 stride 2 of the unfolded tensor, computed in folded space:
    max over the 4 phase blocks. (B, H/2, W/2, 4C) -> (B, H/2, W/2, C)."""
    b, h2, w2, _ = z.shape
    return jnp.max(z.reshape(b, h2, w2, 4, c), axis=3)


def _fold_index_table() -> np.ndarray:
    """Static table of (si, q, p, d) validity for one axis: entries
    (si+1, qi, pi) -> di or -1."""
    tab = -np.ones((3, 2, 2), dtype=np.int64)
    for si in (-1, 0, 1):
        for qi in (0, 1):
            for pi in (0, 1):
                di = 2 * si + pi - qi + 1
                if 0 <= di <= 2:
                    tab[si + 1, qi, pi] = di
    return tab


_TAB = _fold_index_table()


def fold_conv3_kernel(w: jax.Array) -> jax.Array:
    """Embed a (3,3,C,K) kernel into the folded (3,3,4C,4K) kernel.

    Built by scatter from the original weights each call — a few-KB gather
    that XLA folds into the surrounding graph; parameters, checkpoints and
    gradients stay in the original (3,3,C,K) layout."""
    c, k = w.shape[2], w.shape[3]
    wf = jnp.zeros((3, 3, 4 * c, 4 * k), w.dtype)
    for si in range(3):
        for sj in range(3):
            for qi in range(2):
                for qj in range(2):
                    for pi in range(2):
                        for pj in range(2):
                            di = _TAB[si, qi, pi]
                            dj = _TAB[sj, qj, pj]
                            if di < 0 or dj < 0:
                                continue
                            p = 2 * pi + pj
                            q = 2 * qi + qj
                            wf = wf.at[si, sj, p * c : (p + 1) * c, q * k : (q + 1) * k].set(
                                w[di, dj]
                            )
    return wf


def folded_conv3(z: jax.Array, w: jax.Array, bias: jax.Array | None = None, *, precision=None) -> jax.Array:
    """SAME 3x3 conv in folded space, equivalent to conv3x3(unfold(z), w).
    z: (B, H/2, W/2, 4C); w: (3,3,C,K) original kernel; returns (..., 4K)."""
    wf = fold_conv3_kernel(w)
    y = jax.lax.conv_general_dilated(
        z, wf, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4)
    return y


def pad_to_even(x: jax.Array) -> jax.Array:
    """Zero-pad H, W up to even sizes (right/bottom). For a SAME 3x3 conv the
    added zero row/col reproduces the conv's own zero padding, so outputs at
    the original positions are unchanged (crop after unfolding)."""
    h, w = x.shape[-3], x.shape[-2]
    cfg = [(0, 0)] * x.ndim
    cfg[-3] = (0, h % 2)
    cfg[-2] = (0, w % 2)
    return jnp.pad(x, cfg) if (h % 2 or w % 2) else x


def crop_hw(x: jax.Array, h: int, w: int) -> jax.Array:
    return x[..., :h, :w, :]


def mask_pad_folded(z: jax.Array, c: int, pad_h: bool, pad_w: bool) -> jax.Array:
    """Re-zero the folded positions that correspond to the padded row/col.

    Needed between CHAINED folded convs on padded-odd inputs: each conv (+
    bias) writes nonzero values into the pad row/col, which the equivalent
    unpadded conv would treat as zero padding. Zeroing phase blocks pi=1 at
    the last folded row (and pj=1 at the last folded col) restores the
    invariant exactly. No-op when no padding was applied."""
    if not (pad_h or pad_w):
        return z
    b, h2, w2, c4 = z.shape
    zf = z.reshape(b, h2, w2, 2, 2, c)  # (.., pi, pj, C)
    if pad_h:
        zf = zf.at[:, -1, :, 1, :, :].set(0.0)
    if pad_w:
        zf = zf.at[:, :, -1, :, 1, :].set(0.0)
    return zf.reshape(b, h2, w2, c4)
