"""Viz layer: every plot function renders headlessly (Agg) from real data."""

import os

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hdf5_history(tmp_path_factory):
    from plastic_unet_tpu.train.checkpoint import save_reference_artifacts

    d = tmp_path_factory.mktemp("viz")
    params = {
        "w": np.random.default_rng(0).standard_normal((16, 16)).astype(np.float32),
        "alpha": np.random.default_rng(1).random((16, 16)).astype(np.float32),
        "eta": np.array([0.01], np.float32),
    }
    save_reference_artifacts(
        str(d / "train"), params, {"lr": 3e-4},
        all_losses=np.random.default_rng(2).random(200).tolist(),
        val_train_losses=[0.6, 0.5, 0.4],
        val_test_losses=[0.65, 0.55, 0.5],
        val_accuracies=[0.7, 0.8, 0.85],
    )
    return str(d / "train_data.hdf5")


def test_render_data(hdf5_history):
    from plastic_unet_tpu.viz.plots import render_data

    fig = render_data(hdf5_history, runs_per_epoch=50, window_size=10, show=False)
    assert fig is not None


def test_render_data_no_validation(tmp_path):
    """Validation-less HDF5 (n_val_points == 0) renders only the runs plot."""
    from plastic_unet_tpu.train.checkpoint import save_reference_artifacts
    from plastic_unet_tpu.viz.plots import render_data

    params = {"w": np.zeros((4, 4)), "alpha": np.zeros((4, 4)), "eta": np.array([0.01])}
    save_reference_artifacts(str(tmp_path / "t"), params, {}, [0.5, 0.4], [], [], [])
    fig = render_data(str(tmp_path / "t_data.hdf5"), runs_per_epoch=-1, window_size=1, show=False)
    assert fig is not None


def test_plot_best_iou():
    from plastic_unet_tpu.viz.plots import plot_best_iou

    thr = np.linspace(-0.8, 0.8, 31)
    ious = np.exp(-((thr - 0.1) ** 2))
    assert plot_best_iou(thr, ious, show=False) is not None


def test_plot_coverage_and_depth():
    import pandas as pd

    from plastic_unet_tpu.viz.plots import plot_coverage, plot_depth

    rng = np.random.default_rng(0)
    train_df = pd.DataFrame({
        "coverage": rng.random(50),
        "coverage_class": rng.integers(0, 11, 50),
        "z": rng.integers(50, 900, 50),
    })
    test_df = pd.DataFrame({"z": rng.integers(50, 900, 30)})
    assert plot_coverage(train_df, show=False) is not None
    assert plot_depth(train_df, test_df, show=False) is not None


def test_plot_train_and_image_mask(rng):
    from plastic_unet_tpu.viz.plots import plot_image_mask, plot_test_check, plot_train_check

    X = rng.random((4, 16, 16, 1))
    Y = rng.random((4, 16, 16, 1)) > 0.5
    assert plot_train_check(X, Y, show=False) is not None
    assert plot_test_check(X, show=False) is not None
    assert plot_image_mask(X[0].squeeze(), Y[0], show=False) is not None


def test_moving_average():
    from plastic_unet_tpu.viz.plots import moving_average

    y = np.ones(10)
    np.testing.assert_allclose(moving_average(y, 1), y)
    m = moving_average(np.arange(10, dtype=float), 3)
    assert m.shape == (10,)
    assert m[5] == pytest.approx(5.0)
