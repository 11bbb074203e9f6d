"""Augmentation + TTA transforms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.augment import (
    augment_stream,
    crop_from,
    flip_h,
    flip_v,
    pad_to,
    random_flip_rotate,
    resize_bilinear,
    rot90k,
    tta_expand,
    tta_merge,
)


def test_flips_and_rots(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 3)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(flip_h(x)), np.asarray(x)[:, :, ::-1])
    np.testing.assert_array_equal(np.asarray(flip_v(x)), np.asarray(x)[:, ::-1])
    np.testing.assert_array_equal(np.asarray(rot90k(x, 2)), np.asarray(x)[:, ::-1, ::-1])
    # NCHW-style (channels_last=False) for (B, H, W) masks
    m = jnp.asarray(rng.standard_normal((2, 5, 7)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(flip_h(m, channels_last=False)), np.asarray(m)[:, :, ::-1])


def test_tta_roundtrip(rng):
    """merge(expand(x)) with any transform set must reproduce x when the
    model is identity."""
    x = jnp.asarray(rng.standard_normal((3, 8, 8, 1)).astype(np.float32))
    transforms = ("identity", "hflip", "vflip", "rot180")
    views = tta_expand(x, transforms)  # (T, B, H, W, C)
    assert views.shape == (4, 3, 8, 8, 1)
    merged = tta_merge(views[..., 0], transforms, channels_last=False)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(x[..., 0]), atol=1e-6)


def test_random_flip_rotate_consistency(rng):
    """Image and mask receive the identical transform."""
    img = jnp.asarray(rng.standard_normal((9, 9, 1)).astype(np.float32))
    mask = img[..., 0]  # same content -> must stay equal after transform
    for seed in range(8):
        ai, am = random_flip_rotate(jax.random.PRNGKey(seed), img, mask, channels_last=True)
        np.testing.assert_array_equal(np.asarray(ai[..., 0]), np.asarray(am))


def test_random_flip_rotate_mask_channelless(rng):
    img = jnp.asarray(rng.standard_normal((9, 9, 1)).astype(np.float32))
    mask = jnp.asarray((rng.random((9, 9)) > 0.5).astype(np.float32))
    ai, am = random_flip_rotate(jax.random.PRNGKey(3), img, mask)
    assert ai.shape == img.shape and am.shape == mask.shape


def test_augment_stream_preserves_content(rng):
    X = jnp.asarray(rng.standard_normal((6, 9, 9, 1)).astype(np.float32))
    Y = jnp.asarray((rng.random((6, 9, 9)) > 0.5).astype(np.float32))
    Xa, Ya = augment_stream(jax.random.PRNGKey(0), X, Y)
    assert Xa.shape == X.shape and Ya.shape == Y.shape
    # dihedral transforms preserve multisets of values per sample
    for i in range(6):
        np.testing.assert_allclose(
            np.sort(np.asarray(Xa[i]).ravel()), np.sort(np.asarray(X[i]).ravel()), atol=0
        )


def test_pad_crop_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 101, 101, 1)).astype(np.float32))
    p = pad_to(x, 128)
    assert p.shape == (2, 128, 128, 1)
    back = crop_from(p, 101)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_resize_bilinear_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 101, 101, 1)).astype(np.float32))
    r = resize_bilinear(x, 128)
    assert r.shape == (2, 128, 128, 1)
