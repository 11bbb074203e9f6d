"""CLI smoke tests: reference-compatible flags parse and the train CLI runs
end-to-end on synthetic data."""

import os

import pytest

from plastic_unet_tpu.cli.eval import build_parser as eval_parser
from plastic_unet_tpu.cli.infer import build_parser as infer_parser
from plastic_unet_tpu.cli.train import build_parser as train_parser


def test_train_flags_reference_compatible():
    """The exact invocation from the reference wrapper (train_model.sh:15-19)
    must parse."""
    args = train_parser().parse_args(
        "--epochs 5 --save_every 50 --validate_every 1 "
        "--learning-rate 3e-4 --step-lr 1e5 --max-train-time -1 "
        "--rollout_every 100 --prule hebb --data ./data1 --out ./out --debug".split()
    )
    assert args.epochs == 5 and args.lr == 3e-4 and args.steplr == 1e5
    assert args.validate_every == 1 and args.save_every == 50
    assert args.prule == "hebb" and args.debug


def test_infer_flags_reference_compatible():
    """The invocation from infer_masks.sh:13-16 must parse."""
    args = infer_parser().parse_args(
        "--model ./out/train_net.pth --data ./data1 --out ./out "
        "--mask-threshold 0.5 --visualize --save".split()
    )
    assert args.model == "./out/train_net.pth"
    assert args.mask_threshold == 0.5 and args.visualize and args.save


def test_eval_flags_reference_compatible():
    args = eval_parser().parse_args("--model m.pth --data ./d -v".split())
    assert args.model == "m.pth" and args.debug


def test_short_flags():
    args = train_parser().parse_args("-e 3 -l 1e-4 -s 100 -p oja -o ./o".split())
    assert args.epochs == 3 and args.lr == 1e-4 and args.prule == "oja"


def test_train_cli_synthetic(tmp_path):
    """Full CLI run on synthetic tiles (32px would diverge from the fixed
    101px geometry, so this is a tiny-but-real 101px run)."""
    from plastic_unet_tpu.cli.train import main

    out = tmp_path / "out"
    result = main(
        f"--epochs 1 --validate_every 1 --save_every 1 --learning-rate 3e-4 "
        f"--neurons 2 --synthetic 6 --out {out} --precision parity".split()
    )
    assert len(result.all_losses) == 5  # 6 tiles - 1 val
    assert os.path.exists(out / "train_data.hdf5")
    assert os.path.exists(out / "train_net.pth")


def test_tuned_run_cli_synthetic(tmp_path):
    """The comp-15 tuned-run pipeline end-to-end on synthetic tiles (tiny)."""
    import os

    import pandas as pd

    from plastic_unet_tpu.cli.tuned_run import main

    out = tmp_path / "tuned"
    subm = main(
        f"--synthetic 12 --epochs 1 --validate_every 1 --save_every 1 "
        f"--neurons 2 --max-train-time -1 --out {out}".split()
    )
    sub = pd.read_csv(subm, keep_default_na=False)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert os.path.exists(out / "train_net.pth")


def test_tuned_run_cli_multi_epoch_dispatch(tmp_path):
    """tuned_run with --epochs-per-dispatch (the sweep/short-run knob) must
    produce the same artifact set end-to-end."""
    import os

    import pandas as pd

    from plastic_unet_tpu.cli.tuned_run import main

    out = tmp_path / "tuned_k"
    subm = main(
        f"--synthetic 12 --epochs 2 --validate_every 2 --save_every 2 "
        f"--epochs-per-dispatch 4 --neurons 2 --max-train-time -1 --out {out}".split()
    )
    sub = pd.read_csv(subm, keep_default_na=False)
    assert list(sub.columns) == ["id", "rle_mask"]
    assert os.path.exists(out / "train_net.pth")
