"""Multi-epoch dispatch (cfg.epochs_per_dispatch, PERF.md roadmap #3):
folding K epochs into one jitted scan must be bit-identical to K single-epoch
dispatches — same losses, same final params, same validation history — with
shuffle and augmentation on or off (the driver replicates the per-epoch key
derivation order exactly). Reference dispatch cadence = train.py:78-112."""

import numpy as np
import pytest

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split
from plastic_unet_tpu.train.driver import start_train

SIZE = 16


def _cfg(tmp_path, tag, **kw):
    base = dict(
        out_dir=str(tmp_path / tag),
        epochs=4,
        lr=3e-4,
        val_every=2,
        save_every=4,
        steplr=1e5,
        im_width=SIZE,
        im_height=SIZE,
        im_chan=1,
        neurons=2,
        dropout_ratio=0.25,
        matmul_precision="parity",
    )
    base.update(kw)
    return TrainConfig(**base)


def _run(tmp_path, tag, **kw):
    x_train, x_valid, y_train, y_valid = synthetic_split(6, 3, size=SIZE, seed=7)
    return start_train(x_train, x_valid, y_train, y_valid, _cfg(tmp_path, tag, **kw))


@pytest.mark.parametrize("extra", [{}, {"shuffle": True}, {"shuffle": True, "augment": True}])
def test_multi_epoch_dispatch_bit_identical(tmp_path, extra):
    ref = _run(tmp_path, "ref", **extra)
    chk = _run(tmp_path, "chk", epochs_per_dispatch=8, **extra)

    np.testing.assert_array_equal(np.asarray(chk.all_losses), np.asarray(ref.all_losses))
    np.testing.assert_array_equal(np.asarray(chk.val_test_losses), np.asarray(ref.val_test_losses))
    np.testing.assert_array_equal(np.asarray(chk.val_accuracies), np.asarray(ref.val_accuracies))
    import jax

    for a, b in zip(jax.tree.leaves(ref.state.params), jax.tree.leaves(chk.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(chk.state.step) == int(ref.state.step)


def test_chunks_respect_boundaries(tmp_path):
    """val_every=2 with K=8 must still produce a validation entry every 2
    epochs (chunks stop at the boundary) and the save at epoch 4."""
    chk = _run(tmp_path, "bnd", epochs_per_dispatch=8)
    assert len(chk.val_test_losses) == 2  # epochs 2 and 4
    import os

    assert os.path.exists(str(tmp_path / "bnd" / "train_data.hdf5"))
