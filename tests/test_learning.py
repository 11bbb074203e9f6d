"""Learning sanity: the full training pipeline must actually reduce loss and
produce better-than-trivial masks on easy synthetic data."""

import numpy as np
import pytest

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split
from plastic_unet_tpu.eval.evaluate import score_model_best_iou
from plastic_unet_tpu.train.driver import start_train

SIZE = 32


@pytest.mark.parametrize("rule", ["hebb", "oja"])
def test_training_reduces_loss(tmp_path, rule):
    x_train, x_valid, y_train, y_valid = synthetic_split(24, 8, size=SIZE, seed=7)
    cfg = TrainConfig(
        out_dir=str(tmp_path / rule), epochs=12, lr=1e-3, steplr=1e6,
        val_every=100, save_every=100, im_width=SIZE, im_height=SIZE,
        neurons=4, dropout_ratio=0.1, prule=rule, quirk_epoch_loss=False,
        seed=7,
    )
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    losses = np.asarray(result.all_losses)
    first_epoch = losses[:24].mean()
    last_epoch = losses[-24:].mean()
    assert np.isfinite(losses).all()
    assert last_epoch < 0.8 * first_epoch, (first_epoch, last_epoch)

    xv = np.transpose(x_valid.astype(np.float32), (0, 2, 3, 1))
    thr, iou = score_model_best_iou(result.model, result.state.params, xv, y_valid)
    # better than an all-empty/all-full trivial predictor on this data
    assert iou > 0.2, iou
