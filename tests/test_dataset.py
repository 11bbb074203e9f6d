"""Dataset layer: fake TGS directory -> load, normalize, stratified split."""

import os

import numpy as np
import pytest

from plastic_unet_tpu.data.dataset import cov_to_class, load_test_dataset, load_train_dataset
from plastic_unet_tpu.data.images import load_image

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

N, SIZE = 30, 101


@pytest.fixture(scope="module")
def tgs_dir(tmp_path_factory):
    """Fake TGS layout: train.csv, depths.csv, 16-bit masks, 8-bit images."""
    root = tmp_path_factory.mktemp("tgs")
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "masks").mkdir(parents=True)
    (root / "test" / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = [f"id{i:03d}" for i in range(N)]
    for i, idx in enumerate(ids):
        img = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "images" / f"{idx}.png")
        mask = np.zeros((SIZE, SIZE), np.uint16)
        k = i % 5
        if k:
            mask[: SIZE * k // 5] = 65535
        Image.fromarray(mask).save(root / "train" / "masks" / f"{idx}.png")
    for j in range(7):
        img = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "test" / "images" / f"t{j}.png")
    with open(root / "train.csv", "w") as f:
        f.write("id,rle_mask\n" + "\n".join(f"{i}," for i in ids))
    with open(root / "depths.csv", "w") as f:
        f.write("id,z\n" + "\n".join(f"{i},{100 + 3 * n}" for n, i in enumerate(ids)))
    return str(root)


def test_cov_to_class():
    assert cov_to_class(0.0) == 0
    assert cov_to_class(0.05) == 1
    assert cov_to_class(0.10) == 1
    assert cov_to_class(0.11) == 2
    assert cov_to_class(1.0) == 10


def test_load_train_dataset(tgs_dir):
    x_train, x_valid, y_train, y_valid = load_train_dataset(tgs_dir, SIZE, SIZE, 1)
    assert x_train.shape == (24, 1, SIZE, SIZE)  # 80/20 of 30
    assert x_valid.shape == (6, 1, SIZE, SIZE)
    assert y_train.shape == (24, 1, SIZE, SIZE)
    # masks normalized /65535 -> {0, 1}
    vals = np.unique(np.concatenate([y_train.ravel(), y_valid.ravel()]))
    assert set(np.round(vals, 6)).issubset({0.0, 1.0})
    # images in native 8-bit range
    assert x_train.max() > 1.5


def test_split_is_deterministic(tgs_dir):
    a = load_train_dataset(tgs_dir, SIZE, SIZE, 1)
    b = load_train_dataset(tgs_dir, SIZE, SIZE, 1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_split_stratified_by_coverage(tgs_dir):
    """The 5 coverage classes (0%,20%,40%,60%,80%) must appear in both splits
    proportionally (sklearn stratify)."""
    x_train, x_valid, y_train, y_valid = load_train_dataset(tgs_dir, SIZE, SIZE, 1)
    cov_valid = y_valid.mean(axis=(1, 2, 3))
    # 6 validation samples = one per class plus one extra; at least 4 distinct
    assert len(np.unique(np.round(cov_valid, 2))) >= 4


def test_load_test_dataset(tgs_dir):
    df = load_test_dataset(tgs_dir, SIZE, SIZE, 1)
    assert len(df) == 7
    assert df.images.iloc[0].shape == (SIZE, SIZE)
    df_p = load_test_dataset(tgs_dir, SIZE, SIZE, 1, partial=True, part_size=3)
    assert len(df_p) == 3


def test_load_image_16bit(tgs_dir):
    m = load_image(os.path.join(tgs_dir, "train/masks/id004.png"), (SIZE, SIZE))
    assert m.max() == 65535.0  # native 16-bit range preserved (masks /65535 later)
