"""KeyboardInterrupt handling: the driver must save INTERRUPTED_* artifacts
(reference train.py:306-312) before re-raising."""

import os

import numpy as np
import pytest

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split
from plastic_unet_tpu.train import driver

SIZE = 32


def test_interrupt_saves_state(tmp_path, monkeypatch):
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=4)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "out"), epochs=3, val_every=1, save_every=100,
        im_width=SIZE, im_height=SIZE, neurons=2, matmul_precision="parity",
    )

    calls = {"n": 0}
    real_eval = driver.eval_net

    def interrupting_eval(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt
        return real_eval(*a, **kw)

    monkeypatch.setattr(driver, "eval_net", interrupting_eval)
    with pytest.raises(KeyboardInterrupt):
        driver.start_train(x_train, x_valid, y_train, y_valid, cfg)

    prefix = os.path.join(cfg.out_dir, "INTERRUPTED")
    assert os.path.exists(prefix + "_data.hdf5")
    assert os.path.exists(prefix + "_parameters.dat")
    assert os.path.exists(prefix + "_net.pth")


def test_sigterm_saves_state(tmp_path, monkeypatch):
    """SIGTERM (cloud preemption) must route through the same INTERRUPTED
    save path (driver._sigterm_as_interrupt, an extension over the
    reference's ^C-only handling)."""
    import signal

    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=4)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "out"), epochs=5, val_every=1, save_every=100,
        im_width=SIZE, im_height=SIZE, neurons=2, matmul_precision="parity",
    )

    calls = {"n": 0}
    real_eval = driver.eval_net

    def preempting_eval(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            os.kill(os.getpid(), signal.SIGTERM)  # delivered at next bytecode
        return real_eval(*a, **kw)

    monkeypatch.setattr(driver, "eval_net", preempting_eval)
    with pytest.raises(KeyboardInterrupt):
        driver.start_train(x_train, x_valid, y_train, y_valid, cfg)

    prefix = os.path.join(cfg.out_dir, "INTERRUPTED")
    assert os.path.exists(prefix + "_data.hdf5")
    assert os.path.exists(prefix + "_net.pth")
    # the handler must be uninstalled on exit (default action restored)
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.default_int_handler)


def test_nan_abort_saves_state(tmp_path, monkeypatch):
    """Non-finite loss -> FloatingPointError with NAN_ABORT_* artifacts."""
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=4)
    # poison the inputs to produce NaN losses
    x_train = x_train.copy()
    x_train[0] = np.nan
    cfg = TrainConfig(
        out_dir=str(tmp_path / "out"), epochs=2, val_every=10, save_every=100,
        im_width=SIZE, im_height=SIZE, neurons=2, matmul_precision="parity",
    )
    with pytest.raises(FloatingPointError):
        driver.start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert os.path.exists(os.path.join(cfg.out_dir, "NAN_ABORT_data.hdf5"))


def test_nan_abort_chunked_truncates_at_first_bad_epoch(tmp_path, monkeypatch):
    """With epochs_per_dispatch>1, the NAN_ABORT artifact must contain only
    the losses up to and including the FIRST non-finite epoch row — epochs
    after it in the chunk never 'happened' from the loop's view — and the
    error must name the failing epoch and chunk row (ADVICE r02)."""
    import h5py
    import jax.numpy as jnp

    from plastic_unet_tpu.train import loop as loop_mod

    real_make = loop_mod.make_multi_epoch_fn

    def poisoned_make(*a, **kw):
        fn = real_make(*a, **kw)

        def wrapped(state, X, Y, erngs, pkeys, akeys):
            state, losses = fn(state, X, Y, erngs, pkeys, akeys)
            return state, losses.at[2].set(jnp.nan)  # rows 0,1 fine; row 2 bad

        return wrapped

    monkeypatch.setattr(loop_mod, "make_multi_epoch_fn", poisoned_make)

    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=4)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "out"), epochs=4, epochs_per_dispatch=4,
        val_every=10, save_every=100,
        im_width=SIZE, im_height=SIZE, neurons=2, matmul_precision="parity",
    )
    with pytest.raises(FloatingPointError, match=r"epoch 2 .*row 2"):
        driver.start_train(x_train, x_valid, y_train, y_valid, cfg)

    with h5py.File(os.path.join(cfg.out_dir, "NAN_ABORT_data.hdf5"), "r") as f:
        saved = np.asarray(f["train"]["all_losses"])
    # rows 0..2 inclusive, 8 samples each — NOT the full 4-epoch chunk
    assert saved.shape[0] == 3 * 8
    assert np.isfinite(saved[: 2 * 8]).all() and not np.isfinite(saved[2 * 8 :]).all()
