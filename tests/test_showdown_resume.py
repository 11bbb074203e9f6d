"""Checkpoint/resume exactness of the quality-showdown torch arm.

The round-5 snapshot killed the 250-epoch torch/oja arm at ~epoch 150 with
zero artifacts; scripts/quality_showdown.py now checkpoints (model/opt/
sched/RNG/losses) every --ckpt-every epochs and --resume continues exactly.
This pins the guarantee at tiny scale: an interrupted-then-resumed run must
produce BIT-IDENTICAL final metrics to an uninterrupted one (reference
protocol semantics: unet_p_res_script.py training loop + eval.py:20-64
scoring, both exercised through the showdown harness).
"""

import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(out: Path, *extra: str):
    cmd = [
        sys.executable, str(REPO / "scripts" / "quality_showdown.py"), "torch",
        "--rule", "oja", "--epochs", "4", "--train", "6", "--val", "4",
        "--hard", "--ckpt-every", "2", "--out", str(out), *extra,
    ]
    subprocess.run(cmd, check=True, cwd=REPO, capture_output=True, timeout=600)
    with open(out) as f:
        return json.load(f)


def test_torch_arm_resume_bit_identical(tmp_path):
    a = tmp_path / "a.json"
    ra = _run(a)
    assert ra["epochs_completed"] == 4
    # partial eval was emitted at the epoch-2 checkpoint
    assert json.load(open(str(a) + ".partial"))["epochs_completed"] == 2

    # resume a "killed at epoch 2" twin: same init, same checkpoint
    b = tmp_path / "b.json"
    shutil.copy(str(a) + ".init.pth", str(b) + ".init.pth")
    shutil.copy(str(a) + ".ckpt.pth", str(b) + ".ckpt.pth")
    rb = _run(b, "--resume")

    for k in ("best_iou", "best_threshold", "final_loss_mean100", "eta",
              "iou_curve"):
        assert ra[k] == rb[k], k
