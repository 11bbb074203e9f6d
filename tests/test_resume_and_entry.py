"""Orbax exact-resume, graft entry points, and the HDF5 train path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split
from plastic_unet_tpu.train.driver import start_train

SIZE = 32


def test_orbax_exact_resume(tmp_path):
    """Resume from the orbax TrainState: Adam moments and step counter carry
    over (richer than the reference's weights-only .pth resume)."""
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=3)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "a"), epochs=1, val_every=1, save_every=1, lr=3e-4,
        im_width=SIZE, im_height=SIZE, neurons=2, dropout_ratio=0.0,
        matmul_precision="parity",
    )
    r1 = start_train(x_train, x_valid, y_train, y_valid, cfg)
    ck = os.path.join(cfg.out_dir, "orbax_state")

    cfg2 = TrainConfig(
        out_dir=str(tmp_path / "b"), epochs=1, val_every=1, save_every=1, lr=3e-4,
        im_width=SIZE, im_height=SIZE, neurons=2, dropout_ratio=0.0,
        matmul_precision="parity", resume_orbax=ck,
    )
    r2 = start_train(x_train, x_valid, y_train, y_valid, cfg2)
    # resumed run continues the step counter: 8 (epoch 1) + 8 more
    assert int(r2.state.step) == 16
    # params actually moved on from the checkpointed values
    assert not np.allclose(np.asarray(r1.state.params["w"]), np.asarray(r2.state.params["w"]))


def test_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    activout, hebb = out
    assert activout.shape == (1, 101, 101)
    assert hebb.shape == (1, 101, 101)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_hdf5_train_path(tmp_path):
    """-i/--dataset trains from the HDF5 built by the dataset builder."""
    import h5py

    n, hw = 12, 32
    rng = np.random.default_rng(0)
    imgs = rng.random((n, hw, hw, 3))
    masks = rng.random((n, hw, hw, 1)) > 0.6
    f = str(tmp_path / "ds.hdf5")
    with h5py.File(f, "w") as h:
        h.create_dataset("train/images", data=imgs)
        h.create_dataset("train/masks", data=masks)

    from plastic_unet_tpu.cli.train import main

    out = tmp_path / "out"
    result = main(
        f"--epochs 1 --validate_every 1 --save_every 1 --neurons 2 "
        f"--dataset {f} --out {out} --precision parity".split()
    )
    assert len(result.all_losses) == 9  # 80% of 12 (stratified may round)
