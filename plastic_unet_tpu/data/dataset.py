"""TGS-Salt dataset loading with the reference's exact split semantics.

Reference (src/utils/data_set.py):
  * train: join train.csv + depths.csv (:37-40), load grayscale PNGs resized
    to (H, W) (:43), masks normalized /65535 (16-bit, :44), salt coverage ->
    decile class (:13-16, 47-48), stratified 80/20 split with
    sklearn train_test_split(random_state=42) (:57-63) -> NCHW float arrays.
  * test: walk test/images, optional partial truncation (:87-94).

This module keeps the reference's NCHW output contract (drivers transpose to
NHWC at the device boundary). sklearn is used for the split so the partition
is bit-identical to the reference's.
"""

from __future__ import annotations

import os

import numpy as np

from plastic_unet_tpu.data.images import load_image


def _load_batch(paths: list[str], h: int, w: int) -> np.ndarray:
    """Load a batch of grayscale PNGs (N, h, w) — native threaded C++ loader
    when built, PIL fallback otherwise."""
    try:
        from plastic_unet_tpu.ops.native import load_png_gray_batch_native

        return load_png_gray_batch_native(paths, h, w)
    except Exception:
        return np.stack([load_image(p, (h, w)) for p in paths])


def cov_to_class(val: float) -> int:
    """Salt-coverage decile class (reference data_set.py:13-16)."""
    for i in range(0, 11):
        if val * 10 <= i:
            return i


def load_train_dataset(
    data_dir: str,
    img_width: int,
    img_height: int,
    img_chan: int,
    val_ratio: float = 0.2,
    debug: bool = False,
    return_frames: bool = False,
    show_plots: bool = True,
):
    """Load + stratified-split the train set. Returns
    (x_train, x_valid, y_train, y_valid) as NCHW float arrays; with
    return_frames=True additionally returns (train_df, test_df) — the
    coverage/coverage_class/z EDA frames the reference exposes
    (data_set.py:37-54).

    debug=True reproduces the reference EDA path (data_set.py:51-54): the
    mask spot-check print (`train_df.masks[10]`, positional row 10) and the
    plot_coverage / plot_depth distribution plots."""
    import pandas as pd
    from sklearn.model_selection import train_test_split

    train_df = pd.read_csv(os.path.join(data_dir, "train.csv"), index_col="id", usecols=[0])
    depths_df = pd.read_csv(os.path.join(data_dir, "depths.csv"), index_col="id")
    train_df = train_df.join(depths_df)
    # depths rows not in train.csv are the (unlabeled) test tiles — the
    # reference derives its EDA test_df the same way (data_set.py:40)
    test_df = depths_df[~depths_df.index.isin(train_df.index)]

    images = _load_batch(
        [f"{data_dir}/train/images/{idx}.png" for idx in train_df.index], img_height, img_width
    )
    masks = (
        _load_batch([f"{data_dir}/train/masks/{idx}.png" for idx in train_df.index], img_height, img_width)
        / 65535
    )
    coverage = masks.sum(axis=(1, 2)) / (img_height * img_width)
    train_df["masks"] = list(masks)
    train_df["coverage"] = coverage
    train_df["coverage_class"] = [cov_to_class(c) for c in coverage]

    if debug:
        # reference spot-check + EDA plots (data_set.py:51-54)
        if len(train_df) > 10:
            print(train_df.masks.iloc[10])
        from plastic_unet_tpu.viz.plots import plot_coverage, plot_depth

        plot_coverage(train_df, show=show_plots)
        plot_depth(train_df, test_df, show=show_plots)

    x = np.array(images).reshape(-1, img_chan, img_height, img_width)
    y = np.array(masks).reshape(-1, 1, img_height, img_width)

    x_train, x_valid, y_train, y_valid = train_test_split(
        x, y, test_size=val_ratio, stratify=train_df["coverage_class"].tolist(), random_state=42
    )
    if return_frames:
        return x_train, x_valid, y_train, y_valid, train_df, test_df
    return x_train, x_valid, y_train, y_valid


def load_test_dataset(
    data_dir: str,
    img_width: int,
    img_height: int,
    img_chan: int,
    partial: bool = False,
    part_size: int = 100,
    debug: bool = False,
):
    """Load the test set. Returns a DataFrame indexed by tile id with an
    'images' column (reference contract, data_set.py:68-94)."""
    import pandas as pd

    test_ids = [name[:-4] for name in next(os.walk(os.path.join(data_dir, "test/images")))[2]]
    if partial:
        test_ids = test_ids[:part_size]
    test_df = pd.DataFrame(index=test_ids)
    imgs = _load_batch([f"{data_dir}/test/images/{idx}.png" for idx in test_df.index], img_height, img_width)
    test_df["images"] = list(imgs)
    return test_df
