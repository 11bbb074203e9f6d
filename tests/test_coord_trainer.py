"""CoordConv trainer: model.fit-style semantics (val split, checkpointing,
history pickle, timed stop) + prediction with resize-back."""

import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from plastic_unet_tpu.data.synthetic import synthetic_tiles
from plastic_unet_tpu.train.coord_trainer import (
    construct_model,
    do_training,
    keras_bce,
    keras_mean_iou,
    load_coord_model,
    start_prediction,
)

SIZE = 32  # CoordConvUNet needs /16-divisible inputs


def _data(n, rng_seed=0):
    imgs, masks = synthetic_tiles(n, size=SIZE, seed=rng_seed)
    X = np.transpose(imgs, (0, 2, 3, 1)) * 255.0  # the Keras path feeds 0..255 (x/255 in-model)
    Y = np.transpose(masks, (0, 2, 3, 1))
    return X.astype(np.float32), Y.astype(np.float32)


def test_keras_bce_matches_keras_formula(rng):
    p = rng.random(1000).astype(np.float32)
    y = (rng.random(1000) > 0.5).astype(np.float32)
    pc = np.clip(p, 1e-7, 1 - 1e-7)
    want = -np.mean(y * np.log(pc) + (1 - y) * np.log(1 - pc))
    assert float(keras_bce(jnp.asarray(p), jnp.asarray(y))) == pytest.approx(want, abs=1e-5)


def test_keras_mean_iou_reasonable(rng):
    y = (rng.random((8, SIZE, SIZE, 1)) > 0.5).astype(np.float32)
    perfect = float(keras_mean_iou(jnp.asarray(y), jnp.asarray(y)))
    assert perfect == pytest.approx(1.0, abs=1e-6)
    inverted = float(keras_mean_iou(jnp.asarray(y), jnp.asarray(1 - y)))
    assert inverted < 0.1


def test_training_and_artifacts(tmp_path):
    X, Y = _data(40)
    model, params = construct_model(SIZE, SIZE, 1, with_r=False)
    model_file = str(tmp_path / "model-tgs.ckpt")
    params2, history = do_training(
        model, params, X, Y, epochs=2, max_train_time=-1, model_file=model_file, batch_size=8, verbose=1
    )
    assert len(history["loss"]) == 2
    assert len(history["val_mean_iou"]) == 2
    assert os.path.exists(model_file)  # best checkpoint
    assert os.path.exists(model_file + "_final")
    hist_file = model_file + "_final_history.pickle"
    assert os.path.exists(hist_file)
    with open(hist_file, "rb") as f:
        h = pickle.load(f)
    assert set(h.keys()) == {"loss", "val_loss", "mean_iou", "val_mean_iou"}

    # history is plottable by the viz layer (plot_history contract)
    from plastic_unet_tpu.viz.plots import plot_history

    fig = plot_history(hist_file, show=False)
    assert fig is not None


def test_load_and_predict_with_resize_back(tmp_path):
    X, Y = _data(16)
    model, params = construct_model(SIZE, SIZE, 1, with_r=False)
    model_file = str(tmp_path / "m.ckpt")
    do_training(model, params, X, Y, epochs=1, max_train_time=-1, model_file=model_file)
    model2, params2 = load_coord_model(model_file + "_final", SIZE, SIZE, 1, with_r=False)
    sizes = [(101, 101)] * 4  # original tile size; predictions resized back
    preds = start_prediction(model2, params2, X[:4], sizes)
    assert len(preds) == 4
    assert preds[0].shape == (101, 101)
    assert np.all(np.isfinite(preds[0]))


def test_timed_stopping(tmp_path):
    X, Y = _data(24)
    model, params = construct_model(SIZE, SIZE, 1, with_r=False)
    _, history = do_training(
        model, params, X, Y, epochs=1000, max_train_time=1, model_file=str(tmp_path / "m.ckpt")
    )
    assert len(history["loss"]) < 1000
