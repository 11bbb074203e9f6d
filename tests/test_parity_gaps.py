"""Round-2 parity gap closures (VERDICT.md round-1 item 8):
  * loader debug EDA — coverage/coverage_class/z frames + plot wiring
    (reference data_set.py:51-54)
  * epoch>100 loss_last_100 debug print with its single-element indexing
    quirk (reference train.py:167-170)
  * checkpoint writer guarded for plastic=False (vanilla) params
"""

import os

import numpy as np
import pytest

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split
from plastic_unet_tpu.train.driver import start_train

SIZE = 16


def _cfg(tmp_path, **kw):
    base = dict(
        out_dir=str(tmp_path / "out"),
        epochs=2,
        lr=3e-4,
        val_every=500,
        save_every=500,
        steplr=1e5,
        im_width=SIZE,
        im_height=SIZE,
        im_chan=1,
        neurons=2,
        dropout_ratio=0.25,
        debug=True,
        matmul_precision="parity",
    )
    base.update(kw)
    return TrainConfig(**base)


def test_loader_debug_eda_frames(tmp_path, capsys):
    """debug=True builds the reference's EDA frames (coverage, coverage_class,
    z) and runs the mask spot-check + coverage/depth plots headlessly."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from plastic_unet_tpu.data.dataset import load_train_dataset

    root = tmp_path / "tgs"
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "masks").mkdir(parents=True)
    rng = np.random.default_rng(3)
    n = 15
    ids = [f"e{i:03d}" for i in range(n)]
    for i, idx in enumerate(ids):
        img = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "images" / f"{idx}.png")
        mask = np.zeros((SIZE, SIZE), np.uint16)
        if i % 3:
            mask[: SIZE * (i % 3) // 3] = 65535
        Image.fromarray(mask).save(root / "train" / "masks" / f"{idx}.png")
    with open(root / "train.csv", "w") as f:
        f.write("id,rle_mask\n" + "\n".join(f"{i}," for i in ids))
    with open(root / "depths.csv", "w") as f:
        # 5 extra depth-only rows -> the EDA test_df (data_set.py:40)
        extra = [f"x{j}" for j in range(5)]
        f.write("id,z\n" + "\n".join(f"{i},{50 + 7 * k}" for k, i in enumerate(ids + extra)))

    out = load_train_dataset(
        str(root), SIZE, SIZE, 1, debug=True, return_frames=True, show_plots=False
    )
    x_train, x_valid, y_train, y_valid, train_df, test_df = out
    assert x_train.shape[0] + x_valid.shape[0] == n
    # the reference's EDA columns (data_set.py:43-48)
    for col in ("masks", "coverage", "coverage_class", "z"):
        assert col in train_df.columns
    assert "z" in test_df.columns and len(test_df) == 5
    np.testing.assert_allclose(
        train_df["coverage"].to_numpy(),
        np.stack(train_df["masks"].tolist()).sum(axis=(1, 2)) / (SIZE * SIZE),
    )
    # mask spot-check print (data_set.py:52) fired for row 10
    assert str(train_df.masks.iloc[10]) in capsys.readouterr().out

    # split unchanged by the EDA wiring
    ref = load_train_dataset(str(root), SIZE, SIZE, 1)
    np.testing.assert_array_equal(ref[0], x_train)
    np.testing.assert_array_equal(ref[3], y_valid)


def test_loss_last_100_quirk_print(tmp_path, capsys):
    """Reference train.py:167-170: at epoch > 100 the save block prints the
    'average loss over the last 100 epochs' — which, thanks to the missing
    ':', is actually the single loss all_losses[-samples_count*100]."""
    x_train, x_valid, y_train, y_valid = synthetic_split(2, 2, size=SIZE, seed=5)
    cfg = _cfg(tmp_path, epochs=102)
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    out = capsys.readouterr().out
    assert "Average loss over the last 100 epochs:" in out
    line = [l for l in out.splitlines() if "last 100 epochs" in l][-1]
    printed = float(line.split(":")[-1])
    # samples_count=2, len(all_losses)=204 -> quirk element is index -200 == 4
    assert printed == pytest.approx(float(result.all_losses[-200]), rel=1e-6)
    assert printed != pytest.approx(float(np.mean(result.all_losses[-200:])), rel=1e-3)


def test_vanilla_plastic_false_driver_and_checkpoint(tmp_path):
    """plastic=False (vanilla U-Net extension) must train and checkpoint
    through the full driver: no net/{w,alpha,eta} datasets, .pth without
    plastic keys, history readable by the visualizer."""
    import h5py

    from plastic_unet_tpu.viz.plots import load_train_history

    x_train, x_valid, y_train, y_valid = synthetic_split(4, 2, size=SIZE, seed=6)
    cfg = _cfg(tmp_path, epochs=2, save_every=2, val_every=1, plastic=False)
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert all(np.isfinite(l) for l in result.all_losses)
    assert "w" not in result.state.params

    prefix = os.path.join(cfg.out_dir, "train")
    with h5py.File(prefix + "_data.hdf5", "r") as f:
        assert "net" not in f or not set(f["net"].keys())
        assert f["train/all_losses"].shape == (8,)
    hist = load_train_history(prefix + "_data.hdf5")
    assert "w" not in hist and len(hist["all_losses"]) == 8

    try:
        import torch
    except ImportError:
        return
    sd = torch.load(prefix + "_net.pth", map_location="cpu")
    assert "w" not in sd and any(k.startswith("conv1") for k in sd)
