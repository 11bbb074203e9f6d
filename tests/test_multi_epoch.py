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


@pytest.mark.parametrize(
    "extra",
    [{}, {"shuffle": True, "augment": True}, {"trace_mode": "pmean"}],
    ids=["plain", "shuffle_augment", "pmean"],
)
def test_dp_chunks_bit_identical(tmp_path, extra):
    """epochs_per_dispatch>1 with devices>1 (round 3: the DP multi-epoch
    dispatch, parallel/dp.py::make_dp_multi_epoch_fn) must be bit-identical
    to per-epoch DP dispatches — incl. shard-local shuffle, the
    global-flatten augmentation key order, and the pmean trace-coherence
    mode."""
    tag = "_".join(sorted(extra)) or "plain"
    ref = _run(tmp_path, "dpref" + tag, epochs=4, devices=2, **extra)
    chk = _run(tmp_path, "dpchk" + tag, epochs=4, devices=2,
               epochs_per_dispatch=8, **extra)

    np.testing.assert_array_equal(np.asarray(chk.all_losses), np.asarray(ref.all_losses))
    np.testing.assert_array_equal(np.asarray(chk.val_test_losses), np.asarray(ref.val_test_losses))
    import jax

    for a, b in zip(jax.tree.leaves(ref.state.params), jax.tree.leaves(chk.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(chk.state.step) == int(ref.state.step)


def test_chunk_epochs_boundary_math():
    """chunk_epochs never runs past a periodic event and partitions the
    epoch range exactly."""
    from plastic_unet_tpu.train.driver import chunk_epochs

    # val_every=2, save_every=4: boundaries at epochs 1,3,5,7 (events when
    # (e+1) % period == 0); K=8 folds up to each boundary inclusive.
    periods = (2, 4, 50000)
    seen = []
    e = 0
    while e < 10:
        k = chunk_epochs(e, 10, 8, periods)
        last = e + k - 1
        assert (last + 1) % 2 == 0 or last == 9  # ends on a boundary or final
        seen.append((e, k))
        e += k
    assert sum(k for _, k in seen) == 10

    # K=1 degenerates to per-epoch regardless of periods
    assert all(chunk_epochs(e, 10, 1, periods) == 1 for e in range(10))
    # a chunk starting ON an event epoch has size 1
    assert chunk_epochs(1, 10, 8, (2, 100, 100)) == 1
    # no periods: bounded by remaining epochs and K
    assert chunk_epochs(7, 10, 8, (0, 0, 0)) == 3
    assert chunk_epochs(0, 100, 8, (0, 0, 0)) == 8
