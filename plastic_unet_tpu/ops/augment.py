"""Device-side augmentation + TTA (jit-fused transforms).

These are capability *extensions* over the reference (BASELINE.md: the
reference imports Keras ImageDataGenerator but never uses it,
coord_conv_script.py:33, and has no TTA) — with augmentation/TTA disabled
the pipeline reproduces reference outputs exactly.

All transforms operate on NHWC (or NH W) arrays and are pure functions of a
PRNG key, so they fuse into the surrounding jit (no host round trips).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Deterministic geometric transforms (dihedral group elements)
# ---------------------------------------------------------------------------


def _spatial_axes(x: jax.Array, channels_last: bool) -> tuple[int, int]:
    return (x.ndim - 3, x.ndim - 2) if channels_last else (x.ndim - 2, x.ndim - 1)


def flip_h(x: jax.Array, channels_last: bool = True) -> jax.Array:
    return jnp.flip(x, axis=_spatial_axes(x, channels_last)[1])


def flip_v(x: jax.Array, channels_last: bool = True) -> jax.Array:
    return jnp.flip(x, axis=_spatial_axes(x, channels_last)[0])


def rot90k(x: jax.Array, k: int, channels_last: bool = True) -> jax.Array:
    h_ax, w_ax = _spatial_axes(x, channels_last)
    return jnp.rot90(x, k=k, axes=(h_ax, w_ax))


def transpose_hw(x: jax.Array, channels_last: bool = True) -> jax.Array:
    """Reflection over the main diagonal: out[i, j] = in[j, i] (square tiles).
    Self-inverse."""
    h_ax, w_ax = _spatial_axes(x, channels_last)
    return jnp.swapaxes(x, h_ax, w_ax)


def anti_transpose_hw(x: jax.Array, channels_last: bool = True) -> jax.Array:
    """Reflection over the anti-diagonal: out[i, j] = in[n-1-j, n-1-i].
    Self-inverse (= rot180 of the transpose)."""
    return rot90k(transpose_hw(x, channels_last), 2, channels_last)


# TTA transform registry: name -> (forward on image, inverse on mask).
# The full dihedral group D4 (8 views): 4 rotations + 4 reflections. The
# rotations' inverses rotate the other way; the reflections are self-inverse.
# Note the two transposes swap H/W, which is only shape-preserving on square
# tiles — exactly the TGS 101x101 geometry.
TTA_TRANSFORMS = {
    "identity": (lambda x, cl=True: x, lambda m, cl=True: m),
    "hflip": (flip_h, flip_h),
    "vflip": (flip_v, flip_v),
    "rot90": (lambda x, cl=True: rot90k(x, 1, cl), lambda m, cl=True: rot90k(m, 3, cl)),
    "rot180": (lambda x, cl=True: rot90k(x, 2, cl), lambda m, cl=True: rot90k(m, 2, cl)),
    "rot270": (lambda x, cl=True: rot90k(x, 3, cl), lambda m, cl=True: rot90k(m, 1, cl)),
    "transpose": (transpose_hw, transpose_hw),
    "anti_transpose": (anti_transpose_hw, anti_transpose_hw),
}

# Canonical view sets (used by CLI/serving --tta presets).
TTA_VIEWS_2 = ("identity", "hflip")
TTA_VIEWS_4 = ("identity", "hflip", "vflip", "rot180")
TTA_VIEWS_8 = tuple(TTA_TRANSFORMS)  # the full dihedral group


def parse_tta(spec: str) -> tuple[str, ...]:
    """Parse a --tta CLI spec: a preset ('tta2'/'tta4'/'tta8'/'all') or a
    comma-separated list of view names from TTA_TRANSFORMS."""
    presets = {"tta2": TTA_VIEWS_2, "tta4": TTA_VIEWS_4, "tta8": TTA_VIEWS_8, "all": TTA_VIEWS_8}
    s = spec.strip().lower()
    if s in presets:
        return presets[s]
    views = tuple(v.strip() for v in s.split(",") if v.strip())
    if not views:
        raise ValueError(
            f"empty TTA spec {spec!r}; valid: {sorted(TTA_TRANSFORMS)} or presets {sorted(presets)}"
        )
    unknown = [v for v in views if v not in TTA_TRANSFORMS]
    if unknown:
        raise ValueError(f"unknown TTA view(s) {unknown}; valid: {sorted(TTA_TRANSFORMS)} or presets {sorted(presets)}")
    return views


def tta_expand(x: jax.Array, transforms: Sequence[str] = ("identity", "hflip"), channels_last: bool = True) -> jax.Array:
    """Stack TTA views: (B, ...) -> (T, B, ...)."""
    return jnp.stack([TTA_TRANSFORMS[t][0](x, channels_last) for t in transforms], axis=0)


def tta_merge(preds: jax.Array, transforms: Sequence[str] = ("identity", "hflip"), channels_last: bool = False) -> jax.Array:
    """Invert each view's geometry and average: (T, B, H, W) -> (B, H, W).
    channels_last=False because plastic-head outputs are (B, nbf, nbf)."""
    undone = [TTA_TRANSFORMS[t][1](preds[i], channels_last) for i, t in enumerate(transforms)]
    return jnp.mean(jnp.stack(undone, axis=0), axis=0)


def tta_batched_apply(forward, x: jax.Array, transforms: Sequence[str]) -> jax.Array:
    """Fold the T TTA views into the batch axis of ONE forward and merge.

    forward: (T*B, H, W, C) NHWC -> (T*B, nbf, nbf) masks. Exactly equal to T
    per-view passes because eval-mode per-sample math is batch-position-
    independent (no dropout, no cross-batch reductions) —
    tests/test_augment.py::test_batched_views_tta_exact. The single source of
    the fold/merge used by both predict_masks_tta(batch_views=True) and the
    exported serving graph (submit/export.py)."""
    n = x.shape[0]
    allv = jnp.concatenate([TTA_TRANSFORMS[t][0](x, True) for t in transforms], axis=0)
    preds = forward(allv)
    stacked = preds.reshape((len(transforms), n) + preds.shape[1:])
    return tta_merge(stacked, transforms, channels_last=False)


# ---------------------------------------------------------------------------
# Random train-time augmentation
# ---------------------------------------------------------------------------


def random_flip_rotate(key: jax.Array, img: jax.Array, mask: jax.Array, channels_last: bool = True):
    """Random dihedral augmentation applied identically to (img, mask).

    img: (H, W, C) [or batched], mask: (H, W) [or batched]. Square tiles.
    Draws independent h-flip, v-flip and 90-degree-rotation bits.
    """
    kh, kv, kr = jax.random.split(key, 3)
    do_h = jax.random.bernoulli(kh)
    do_v = jax.random.bernoulli(kv)
    k_rot = jax.random.randint(kr, (), 0, 4)

    def apply(x, cl):
        x = jax.lax.cond(do_h, lambda v: flip_h(v, cl), lambda v: v, x)
        x = jax.lax.cond(do_v, lambda v: flip_v(v, cl), lambda v: v, x)
        return jax.lax.switch(k_rot, [lambda v: v] + [lambda v, k=k: rot90k(v, k, cl) for k in (1, 2, 3)], x)

    # a mask with one fewer dim than the image has no channel axis: its
    # spatial dims are the trailing two (channels_last=False semantics)
    mask_cl = channels_last and mask.ndim == img.ndim
    return apply(img, channels_last), apply(mask, mask_cl)


def augment_stream(key: jax.Array, X: jax.Array, Y: jax.Array, channels_last: bool = True):
    """vmap random_flip_rotate over a sample stream (N, ...)."""
    keys = jax.random.split(key, X.shape[0])
    return jax.vmap(lambda k, x, y: random_flip_rotate(k, x, y, channels_last))(keys, X, Y)


# ---------------------------------------------------------------------------
# Pad / resize to a target size (device-side)
# ---------------------------------------------------------------------------


def pad_to(x: jax.Array, size: int, mode: str = "reflect", channels_last: bool = True) -> jax.Array:
    """Pad spatial dims up to (size, size), symmetric with the extra pixel on
    the right/bottom (e.g. 101 -> 128 for MXU-friendly shapes)."""
    h_ax, w_ax = _spatial_axes(x, channels_last)
    dh, dw = size - x.shape[h_ax], size - x.shape[w_ax]
    cfg = [(0, 0)] * x.ndim
    cfg[h_ax] = (dh // 2, dh - dh // 2)
    cfg[w_ax] = (dw // 2, dw - dw // 2)
    return jnp.pad(x, cfg, mode=mode)


def crop_from(x: jax.Array, size: int, channels_last: bool = True) -> jax.Array:
    """Inverse of pad_to: center-crop spatial dims back down to (size, size)."""
    h_ax, w_ax = _spatial_axes(x, channels_last)
    dh, dw = x.shape[h_ax] - size, x.shape[w_ax] - size
    x = jax.lax.slice_in_dim(x, dh // 2, dh // 2 + size, axis=h_ax)
    return jax.lax.slice_in_dim(x, dw // 2, dw // 2 + size, axis=w_ax)


def resize_bilinear(x: jax.Array, size: int, channels_last: bool = True) -> jax.Array:
    """Device-side bilinear resize of the spatial dims to (size, size)."""
    h_ax, w_ax = _spatial_axes(x, channels_last)
    shape = list(x.shape)
    shape[h_ax] = size
    shape[w_ax] = size
    return jax.image.resize(x, shape, method="bilinear")
