"""Synthetic tile generator contracts (plastic_unet_tpu/data/synthetic.py).

The default regime must stay BIT-stable across rounds: the committed
quality artifacts (results/showdown/, PARITY_QUALITY.md) were generated
from it and reproduce exactly. The round-5 `hard` regime (VERDICT r04
item 7) must be deterministic, genuinely harder (weak brightness cue,
distractors), and share the default's shape/dtype/range contract.
"""

import numpy as np

from plastic_unet_tpu.data.synthetic import synthetic_split, synthetic_tiles


def test_default_regime_bit_stable():
    # Fingerprint pinned when the generator was refactored (round 5) —
    # guards the committed showdown artifacts' reproducibility.
    imgs, masks = synthetic_tiles(4, size=32, seed=123)
    assert imgs.shape == masks.shape == (4, 1, 32, 32)
    assert imgs.dtype == masks.dtype == np.float32
    # (verified equal to the pre-refactor round-4 generator, git c348091)
    np.testing.assert_allclose(float(imgs.sum()), 2243.99951171875, rtol=0, atol=1e-3)
    np.testing.assert_allclose(float(masks.sum()), 789.0, rtol=0, atol=0)


def test_hard_regime_contract():
    imgs, masks = synthetic_tiles(16, size=64, seed=5, hard=True)
    assert imgs.shape == masks.shape == (16, 1, 64, 64)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert set(np.unique(masks)) <= {0.0, 1.0}
    # deterministic
    imgs2, masks2 = synthetic_tiles(16, size=64, seed=5, hard=True)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(masks, masks2)
    # differs from the default regime at the same seed
    imgs_d, _ = synthetic_tiles(16, size=64, seed=5)
    assert not np.array_equal(imgs, imgs_d)


def test_hard_regime_weak_brightness_cue():
    """The default regime's salt is +0.25 brighter — trivially separable by
    mean intensity. Hard salt carries the same +0.12 bump as the distractor
    ellipses, so the mean-brightness gap between salt and non-salt pixels
    must be much smaller than the default regime's."""
    def gap(hard):
        imgs, masks = synthetic_tiles(64, size=64, seed=11, hard=hard)
        m = masks.astype(bool)
        return float(imgs[m].mean() - imgs[~m].mean())

    assert gap(hard=True) < 0.6 * gap(hard=False)


def test_hard_regime_salt_present_but_sparser():
    _, masks_h = synthetic_tiles(64, size=64, seed=3, hard=True)
    _, masks_d = synthetic_tiles(64, size=64, seed=3, hard=False)
    cov_h = masks_h.mean()
    assert 0.01 < cov_h < 0.5  # non-degenerate
    assert cov_h < masks_d.mean()  # smaller bodies -> lower coverage


def test_split_passes_hard_through():
    xt, xv, yt, yv = synthetic_split(6, 2, size=32, seed=9, hard=True)
    assert xt.shape == (6, 1, 32, 32) and xv.shape == (2, 1, 32, 32)
    xth, _, _, _ = synthetic_split(6, 2, size=32, seed=9, hard=False)
    assert not np.array_equal(xt, xth)
