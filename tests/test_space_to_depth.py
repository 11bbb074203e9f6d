"""Space-to-depth folded conv equivalence vs the direct conv."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.space_to_depth import (
    crop_hw,
    fold2,
    folded_conv3,
    mask_pad_folded,
    pad_to_even,
    pool_phases,
    unfold2,
)


def _conv3(x, w, b=None):
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b if b is not None else y


def test_fold_unfold_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 3)).astype(np.float32))
    z = fold2(x)
    assert z.shape == (2, 4, 5, 12)
    np.testing.assert_array_equal(np.asarray(unfold2(z, 3)), np.asarray(x))


@pytest.mark.parametrize("c,k,hw", [(1, 16, 8), (16, 16, 12), (3, 5, 10)])
def test_folded_conv_equals_direct(c, k, hw, rng):
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, k)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((k,)).astype(np.float32) * 0.1)
    want = _conv3(x, w, b)
    got = unfold2(folded_conv3(fold2(x), w, b), k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_folded_conv_odd_size_with_pad(rng):
    """Odd 101-like sizes: pad to even, fold, conv, unfold, crop — equals the
    direct SAME conv on the odd-size input."""
    x = jnp.asarray(rng.standard_normal((1, 11, 13, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * 0.1)
    want = _conv3(x, w)
    xp = pad_to_even(x)
    got = crop_hw(unfold2(folded_conv3(fold2(xp), w), 8), 11, 13)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chained_folded_convs(rng):
    """Multiple convs + relus can stay folded; only the ends fold/unfold."""
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 6)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 6, 6)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 6, 6)).astype(np.float32) * 0.2)
    want = _conv3(jax.nn.relu(_conv3(x, w1)), w2)
    z = fold2(x)
    z = folded_conv3(jax.nn.relu(folded_conv3(z, w1)), w2)
    np.testing.assert_allclose(np.asarray(unfold2(z, 6)), np.asarray(want), atol=1e-5)


def test_chained_folded_convs_odd_size(rng):
    """Chained convs on a padded-odd input: the pad row/col must be re-zeroed
    between convs (mask_pad_folded) for exact equivalence."""
    x = jnp.asarray(rng.standard_normal((1, 11, 11, 4)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    want = _conv3(jax.nn.relu(_conv3(x, w1, b1)), w2, b2)
    z = fold2(pad_to_even(x))
    z = mask_pad_folded(jax.nn.relu(folded_conv3(z, w1, b1)), 4, True, True)
    z = folded_conv3(z, w2, b2)
    got = crop_hw(unfold2(z, 4), 11, 11)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pool_phases_equals_maxpool(rng):
    from plastic_unet_tpu.models.blocks import max_pool_2x2

    x = jnp.asarray(rng.standard_normal((2, 12, 12, 5)).astype(np.float32))
    want = max_pool_2x2(x)
    got = pool_phases(fold2(x), 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pool_phases_odd_crop(rng):
    """101-style odd size: pad to even, phase-max, crop to floor(n/2) equals
    torch-floor maxpool of the odd input."""
    from plastic_unet_tpu.models.blocks import max_pool_2x2

    x = jnp.asarray(rng.standard_normal((1, 11, 11, 3)).astype(np.float32))
    want = max_pool_2x2(x)  # (1, 5, 5, 3)
    # pad with -inf-safe values? zero-pad suffices here only if activations
    # can be negative — use the exact approach: pad, pool, crop.
    got = crop_hw(pool_phases(fold2(pad_to_even(x)), 3), 5, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
