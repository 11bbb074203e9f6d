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


def test_all_dihedral_views_invert(rng):
    """Every TTA_TRANSFORMS entry's inverse must undo its forward exactly —
    including the two transposes, which swap H and W (VERDICT r02 #5). Uses
    a non-symmetric array so any wrong inverse is caught."""
    from plastic_unet_tpu.ops.augment import TTA_TRANSFORMS

    assert len(TTA_TRANSFORMS) == 8  # the full dihedral group D4
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 3)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((2, 9, 9)).astype(np.float32))
    for name, (fwd, inv) in TTA_TRANSFORMS.items():
        np.testing.assert_array_equal(
            np.asarray(inv(fwd(x, True), True)), np.asarray(x), err_msg=name
        )
        np.testing.assert_array_equal(
            np.asarray(inv(fwd(m, False), False)), np.asarray(m), err_msg=name
        )


def test_transpose_views_semantics(rng):
    """transpose = reflection over the main diagonal; anti_transpose over the
    anti-diagonal (pinned against numpy on both layouts)."""
    from plastic_unet_tpu.ops.augment import anti_transpose_hw, transpose_hw

    x = jnp.asarray(rng.standard_normal((2, 5, 5, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(transpose_hw(x)), np.transpose(np.asarray(x), (0, 2, 1, 3))
    )
    np.testing.assert_array_equal(
        np.asarray(anti_transpose_hw(x)),
        np.transpose(np.asarray(x), (0, 2, 1, 3))[:, ::-1, ::-1],
    )
    m = jnp.asarray(rng.standard_normal((5, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(transpose_hw(m, False)), np.asarray(m).T)


def test_tta8_roundtrip(rng):
    """Full-dihedral merge(expand(x)) reproduces x under an identity model."""
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_8

    x = jnp.asarray(rng.standard_normal((3, 8, 8, 1)).astype(np.float32))
    views = tta_expand(x, TTA_VIEWS_8)
    assert views.shape == (8, 3, 8, 8, 1)
    merged = tta_merge(views[..., 0], TTA_VIEWS_8, channels_last=False)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(x[..., 0]), atol=1e-6)


def test_parse_tta():
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_4, TTA_VIEWS_8, parse_tta

    assert parse_tta("identity") == ("identity",)
    assert parse_tta("identity,hflip") == ("identity", "hflip")
    assert parse_tta("tta4") == TTA_VIEWS_4
    assert parse_tta("tta8") == TTA_VIEWS_8
    assert parse_tta("all") == TTA_VIEWS_8
    with pytest.raises(ValueError, match="unknown TTA view"):
        parse_tta("identity,bogus")


def test_batched_views_tta_exact(rng):
    """batch_views=True (one T*N-batch pass) must equal the sequential
    per-view path exactly — per-sample eval math is batch-position
    independent (VERDICT r02 #8)."""
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.inference import predict_masks_tta

    size = 16
    model = UNetPRes(n_channels=1, n_classes=1, nbf=size, neurons=2)
    x0 = jnp.zeros((1, size, size, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]
    X = jnp.asarray(rng.standard_normal((5, size, size, 1)).astype(np.float32))
    transforms = ("identity", "hflip", "rot90", "transpose")
    seq = predict_masks_tta(model, params, X, transforms=transforms, chunk=4)
    bat = predict_masks_tta(model, params, X, transforms=transforms, chunk=4, batch_views=True)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(bat))


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
