"""End-to-end CLI runs for infer/eval against a fake TGS directory and a
reference-format .pth — the full reference command-line workflow."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

PIL = pytest.importorskip("PIL")
torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402

N, SIZE = 20, 101


@pytest.fixture(scope="module")
def tgs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tgs_cli")
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "masks").mkdir(parents=True)
    (root / "test" / "images").mkdir(parents=True)
    rng = np.random.default_rng(1)
    ids = [f"id{i:03d}" for i in range(N)]
    for i, idx in enumerate(ids):
        img = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "images" / f"{idx}.png")
        mask = np.zeros((SIZE, SIZE), np.uint16)
        if i % 4:
            mask[: SIZE * (i % 4) // 4] = 65535
        Image.fromarray(mask).save(root / "train" / "masks" / f"{idx}.png")
    for j in range(6):
        img = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "test" / "images" / f"t{j}.png")
    with open(root / "train.csv", "w") as f:
        f.write("id,rle_mask\n" + "\n".join(f"{i}," for i in ids))
    with open(root / "depths.csv", "w") as f:
        f.write("id,z\n" + "\n".join(f"{i},{100 + n}" for n, i in enumerate(ids)))
    return str(root)


@pytest.fixture(scope="module")
def pth_file(tmp_path_factory):
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.utils.torch_interop import flax_params_to_state_dict, save_pth, unetp_res_name_map

    model = UNetPRes(nbf=SIZE, neurons=2)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1))
    p = str(tmp_path_factory.mktemp("pth") / "m.pth")
    save_pth(flax_params_to_state_dict(vs["params"], unetp_res_name_map()), p)
    return p


def test_infer_cli_end_to_end(tgs_dir, pth_file, tmp_path):
    import pandas as pd

    from plastic_unet_tpu.cli.infer import main

    out = str(tmp_path / "out")
    main(
        f"--model {pth_file} --data {tgs_dir} --out {out} --neurons 2 "
        f"--partial --partial-size 3 --precision parity --save".split()
    )
    sub = pd.read_csv(os.path.join(out, "submission.csv"), keep_default_na=False)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert len(sub) == 3  # partial-size
    assert len(os.listdir(os.path.join(out, "masks"))) == 3


def test_infer_cli_fixed_threshold_tta(tgs_dir, pth_file, tmp_path):
    import pandas as pd

    from plastic_unet_tpu.cli.infer import main

    out = str(tmp_path / "out2")
    main(
        f"--model {pth_file} --data {tgs_dir} --out {out} --neurons 2 "
        f"--partial --partial-size 2 --fixed-threshold 0.5 --tta identity,hflip "
        f"--precision parity".split()
    )
    sub = pd.read_csv(os.path.join(out, "submission.csv"), keep_default_na=False)
    assert len(sub) == 2


def test_infer_cli_quant_int8(tgs_dir, pth_file, tmp_path):
    """--quant int8: calibrate on validation images, search the threshold on
    the QUANTIZED model, and write a well-formed submission (the int8 PTQ
    serving extension end-to-end through the reference CLI workflow)."""
    import pandas as pd

    from plastic_unet_tpu.cli.infer import main

    out = str(tmp_path / "out_q")
    main(
        f"--model {pth_file} --data {tgs_dir} --out {out} --neurons 2 "
        f"--partial --partial-size 2 --quant int8 --quant-calib 4 "
        f"--precision parity".split()
    )
    sub = pd.read_csv(os.path.join(out, "submission.csv"), keep_default_na=False)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert len(sub) == 2


def test_eval_cli_end_to_end(tgs_dir, pth_file):
    from plastic_unet_tpu.cli.eval import main

    thr, iou = main(f"--model {pth_file} --data {tgs_dir} --neurons 2 --precision parity".split())
    assert -1.0 < thr < 1.0  # logit-space grid range
    assert 0.0 <= iou <= 1.0
