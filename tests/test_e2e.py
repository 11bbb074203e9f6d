"""End-to-end smoke: synthetic tiles -> train -> checkpoint (reference
artifact formats) -> resume from .pth -> threshold search -> inference ->
RLE submission.csv (SURVEY.md §4 'implication' test plan)."""

import os
import pickle

import numpy as np
import pytest

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split, synthetic_tiles
from plastic_unet_tpu.ops.rle import rle_decode
from plastic_unet_tpu.submit.inference import start_inference
from plastic_unet_tpu.train.driver import start_train

SIZE = 32


def _cfg(tmp_path, **kw):
    base = dict(
        out_dir=str(tmp_path / "out"),
        epochs=2,
        lr=3e-4,
        val_every=1,
        save_every=2,
        steplr=1e5,
        im_width=SIZE,
        im_height=SIZE,
        im_chan=1,
        neurons=2,
        dropout_ratio=0.25,
        debug=True,
        matmul_precision="parity",
        loss_space="probs",
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=1)
    cfg = _cfg(tmp_path)
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    return tmp_path, cfg, result, (x_train, x_valid, y_train, y_valid)


def test_losses_recorded(trained):
    _, _, result, _ = trained
    assert len(result.all_losses) == 16  # 8 samples x 2 epochs
    assert all(np.isfinite(l) for l in result.all_losses)
    assert len(result.val_accuracies) == 2  # val_every=1


def test_reference_artifacts(trained):
    import h5py

    tmp_path, cfg, result, _ = trained
    prefix = os.path.join(cfg.out_dir, "train")
    with h5py.File(prefix + "_data.hdf5", "r") as f:
        assert f["net/w"].shape == (SIZE, SIZE)
        assert f["net/alpha"].shape == (SIZE, SIZE)
        assert f["net/eta"].shape == (1,)
        assert f["train/all_losses"].shape == (16,)
        assert f["validation/train_losses"].shape == (2,)
        assert f["validation/test_losses"].shape == (2,)
        assert f["validation/accuracies"].shape == (2,)
    with open(prefix + "_parameters.dat", "rb") as fo:
        params = pickle.load(fo)
    assert params["lr"] == cfg.lr and params["prule"] == "hebb"
    assert os.path.exists(prefix + "_net.pth")
    assert os.path.isdir(os.path.join(cfg.out_dir, "orbax_state"))


def test_pth_loads_in_torch(trained):
    torch = pytest.importorskip("torch")
    tmp_path, cfg, result, _ = trained
    sd = torch.load(os.path.join(cfg.out_dir, "train_net.pth"), map_location="cpu")
    assert sd["w"].shape == (SIZE, SIZE)
    assert any(k.startswith("conv1.dconv") for k in sd)
    np.testing.assert_allclose(sd["eta"].numpy(), [0.01])  # eta untouched by training


def test_resume_from_pth(trained, tmp_path):
    tmp, cfg, result, data = trained
    x_train, x_valid, y_train, y_valid = data
    cfg2 = _cfg(tmp_path, epochs=1, load=True, model_path=os.path.join(cfg.out_dir, "train_net.pth"))
    result2 = start_train(x_train, x_valid, y_train, y_valid, cfg2)
    # resumed params started from the checkpoint: w must differ from fresh init
    assert len(result2.all_losses) == 8


def test_viz_reads_hdf5(trained):
    """The comp.-12 visualizer contract: render_data reads these datasets."""
    from plastic_unet_tpu.viz.plots import load_train_history

    tmp_path, cfg, result, _ = trained
    hist = load_train_history(os.path.join(cfg.out_dir, "train_data.hdf5"))
    assert hist["all_losses"].shape == (16,)
    assert hist["val_accuracies"].shape == (2,)


def test_inference_submission(trained):
    import pandas as pd

    tmp_path, cfg, result, data = trained
    _, x_valid, _, y_valid = data
    test_imgs, _ = synthetic_tiles(5, size=SIZE, seed=9)
    test_df = pd.DataFrame(index=[f"tile{i}" for i in range(5)])
    test_df["images"] = [t[0] for t in test_imgs]

    subm = start_inference(
        result.model,
        result.state.params,
        test_df,
        x_valid,
        y_valid,
        out_dir=cfg.out_dir,
        img_width=SIZE,
        img_height=SIZE,
        img_chan=1,
        save_masks=True,
    )
    sub = pd.read_csv(subm, index_col="id", keep_default_na=False)
    assert list(sub.index) == [f"tile{i}" for i in range(5)]
    assert "rle_mask" in sub.columns
    # every RLE decodes back to a mask of the right shape
    for rle in sub.rle_mask:
        m = rle_decode("" if pd.isna(rle) else str(rle), (SIZE, SIZE))
        assert m.shape == (SIZE, SIZE)
    # PNG masks dumped
    assert len(os.listdir(os.path.join(cfg.out_dir, "masks"))) == 5


def test_quirk_epoch_loss(trained):
    """val_train_losses[0] must equal all_losses[-N] of epoch 1 (the
    train.py:115 single-element quirk), not the epoch mean."""
    _, _, result, _ = trained
    assert result.val_train_losses[0] == pytest.approx(result.all_losses[0], abs=1e-9)
    assert result.val_train_losses[1] == pytest.approx(result.all_losses[8], abs=1e-9)


def test_max_train_time_stops_early(tmp_path):
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=2)
    cfg = _cfg(tmp_path, epochs=50, max_train_time=1)  # 1 second budget
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert len(result.all_losses) < 50 * 8  # stopped well before 50 epochs


def test_augmented_training_runs(tmp_path):
    """--augment path: random flip/rotate per epoch, training stays finite."""
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=11)
    cfg = _cfg(tmp_path, epochs=2, augment=True)
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert len(result.all_losses) == 16
    assert all(np.isfinite(l) for l in result.all_losses)


def test_rollout_filenames(tmp_path):
    """Filename rollout every `rollout` epochs (train.py:174-176): periodic
    checkpoints get _<epoch+1> suffixes; the terminal save keeps the plain
    prefix."""
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=12)
    cfg = _cfg(tmp_path, epochs=6, save_every=2, val_every=10, rollout=2)
    start_train(x_train, x_valid, y_train, y_valid, cfg)
    files = set(os.listdir(cfg.out_dir))
    assert "train_2_data.hdf5" in files
    assert "train_4_data.hdf5" in files
    assert "train_data.hdf5" in files  # terminal save, no suffix
    assert "train_2_net.pth" in files
