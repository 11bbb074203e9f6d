"""Full-pipeline artifact bit-parity vs the LIVE torch reference (VERDICT r02
next-round item 1, closing the north star's "output fidelity bit-for-bit at
fp32" clause at the artifact level).

Every component is pinned individually elsewhere (forward, trajectory, IoU,
RLE, threshold sweep); this test pins the COMPOSED output: the reference's
own eval+infer code (/root/reference/src/infer.py:110-179, eval.py:20-64)
and this framework's cli-equivalent `submit.start_inference` run the SAME
weights on the SAME tiles, and the resulting `submission.csv` files must be
byte-identical (threshold search -> predict -> RLE -> CSV).

Methodology note: fp32 forwards differ between torch and XLA in the last
ulps, so byte equality of the binarized artifacts requires predictions to
sit away from the decision thresholds. We use the committed showdown init
checkpoint (results/showdown/*.init.pth, a real torch-initialized UNetpRes
at the production 101px geometry) with its plastic-head `w` scaled up so the
sigmoid outputs saturate: binarization margins are then ~10 orders of
magnitude above the cross-framework forward error, making the byte
comparison deterministic rather than luck.
"""

import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_SRC, has_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")



def _stub_skimage():
    """scikit-image is not installed in this environment (data/images.py is
    PIL-backed for exactly this reason); the reference's infer.py imports
    `skimage.io.imsave` at module top but our pipeline path never calls any
    skimage function (no --save-masks, in-memory tiles). Register stub
    modules so the import succeeds; any accidental *call* raises loudly."""
    import types

    def _unavailable(*a, **k):
        raise RuntimeError("skimage stub called — scikit-image is not installed in tests")

    if "skimage" in sys.modules:
        return
    try:
        import skimage  # noqa: F401  (real package present — use it, don't shadow)

        return
    except ImportError:
        pass
    root = types.ModuleType("skimage")
    for sub, names in {"io": ("imread", "imsave", "imshow", "concatenate_images"),
                       "transform": ("resize",), "morphology": ("label",)}.items():
        m = types.ModuleType(f"skimage.{sub}")
        for n in names:
            setattr(m, n, _unavailable)
        setattr(root, sub, m)
        sys.modules[f"skimage.{sub}"] = m
    sys.modules["skimage"] = root


def _import_reference_toplevel(name):
    """Import a top-level reference script (infer/eval) whose intra-repo
    imports (`from unet import ...`, `from utils import ...`) need
    /root/reference/src on sys.path. Modules register under their plain
    names (infer, eval, unet, utils) — nothing in this suite imports
    same-named top-level modules."""
    import importlib

    _stub_skimage()
    # utils/data_visualization.py runs plt.style.use('seaborn-white') at
    # import time; that style name was removed in modern matplotlib —
    # alias it to the renamed seaborn-v0_8 version (or a no-op style).
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.style

    if "seaborn-white" not in matplotlib.style.library:
        matplotlib.style.library["seaborn-white"] = matplotlib.style.library.get(
            "seaborn-v0_8-white", {}
        )
        matplotlib.style.available.append("seaborn-white")
    sys.path.insert(0, REFERENCE_SRC)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(REFERENCE_SRC)


def _synthetic_dataset():
    """Shared tiles for both pipelines, at the production 101x101 geometry."""
    from plastic_unet_tpu.data.synthetic import synthetic_tiles

    val_imgs, val_masks = synthetic_tiles(6, size=101, seed=11)  # NCHW / (N,1,H,W)
    test_imgs, _ = synthetic_tiles(8, size=101, seed=12)
    return val_imgs, val_masks, test_imgs


_SD_CACHE = {}


def _saturated_state_dict():
    """A torch-initialized UNetpRes state dict (the reference's own init, at
    the exact geometry its start_inference hardcodes: neurons=16, nbf=101)
    with the plastic head's fixed weights scaled so sigmoid outputs saturate
    (see module docstring). Seeded for determinism; cached so both tests see
    the identical weights."""
    if "sd" not in _SD_CACHE:
        import torch

        ref_unet = _import_reference_toplevel("unet")
        torch.manual_seed(7)
        net = ref_unet.UNetpRes(n_channels=1, n_classes=1, nbf=101, device=torch.device("cpu"))
        sd = {k: v.detach().clone() for k, v in net.state_dict().items()}
        sd["w"] = sd["w"] * 1000.0
        _SD_CACHE["sd"] = sd
    return _SD_CACHE["sd"]


@pytest.fixture(scope="module")
def pipeline_runs(tmp_path_factory):
    """Run BOTH pipelines once; individual tests assert on the artifacts."""
    import pandas as pd
    import torch

    val_imgs, val_masks, test_imgs = _synthetic_dataset()
    test_ids = ["tile_%03d" % i for i in range(len(test_imgs))]
    # Both `predict` implementations reshape test_df.images from the same
    # flat buffer (reference -> NCHW, rebuild -> NHWC); identical for C=1.
    test_df = pd.DataFrame({"images": [img.astype(np.float32) for img in test_imgs]}, index=test_ids)

    sd = _saturated_state_dict()

    # --- reference pipeline (live torch code, gpu=False) ---
    ref_dir = str(tmp_path_factory.mktemp("ref_out"))
    pth_path = os.path.join(ref_dir, "weights.pth")
    torch.save(sd, pth_path)
    ref_infer = _import_reference_toplevel("infer")
    ref_infer.start_inference(
        model=pth_path,
        test_df=test_df,
        X_valid=val_imgs,
        y_valid=val_masks,
        out_dir=ref_dir,
        img_width=101,
        img_height=101,
        img_chan=1,
        subm_file="submission.csv",
        gpu=False,
    )

    # --- rebuild pipeline (same weights via the name-map converter) ---
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.inference import start_inference
    from plastic_unet_tpu.utils.torch_interop import state_dict_to_flax_params, unetp_res_name_map

    our_dir = str(tmp_path_factory.mktemp("our_out"))
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16)
    params = state_dict_to_flax_params(sd, unetp_res_name_map())
    start_inference(
        model,
        params,
        test_df,
        val_imgs,
        val_masks,
        out_dir=our_dir,
        img_width=101,
        img_height=101,
        img_chan=1,
        subm_file="submission.csv",
    )
    return ref_dir, our_dir


def test_submission_csv_byte_identical(pipeline_runs):
    ref_dir, our_dir = pipeline_runs
    with open(os.path.join(ref_dir, "submission.csv"), "rb") as f:
        ref_bytes = f.read()
    with open(os.path.join(our_dir, "submission.csv"), "rb") as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes
    # sanity: the artifact is non-trivial (header + 8 ids, non-empty RLE)
    lines = ref_bytes.decode().strip().splitlines()
    assert lines[0] == "id,rle_mask"
    assert len(lines) == 9
    assert any(len(l.split(",", 1)[1].strip()) > 0 for l in lines[1:])


def test_chosen_thresholds_identical(pipeline_runs):
    """The composed path's first decision — the validation threshold search —
    must agree too (same argmax over the same 31 logit-space thresholds)."""
    import torch

    val_imgs, val_masks, _ = _synthetic_dataset()
    sd = _saturated_state_dict()

    ref_eval = _import_reference_toplevel("eval")
    ref_unet = _import_reference_toplevel("unet")
    net = ref_unet.UNetpRes(n_channels=1, n_classes=1, nbf=101, device=torch.device("cpu"))
    net.load_state_dict(sd)
    t_ref, iou_ref = ref_eval.score_model_best_iou(
        net, val_imgs, val_masks, torch.device("cpu")
    )

    from plastic_unet_tpu.eval.evaluate import score_model_best_iou
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.utils.torch_interop import state_dict_to_flax_params, unetp_res_name_map

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16)
    params = state_dict_to_flax_params(sd, unetp_res_name_map())
    xv = np.transpose(val_imgs.astype(np.float32), (0, 2, 3, 1))
    t_our, iou_our = score_model_best_iou(model, params, xv, np.asarray(val_masks))

    assert np.isclose(t_our, t_ref, rtol=0, atol=1e-6)  # float32 cast of the same logit grid
    assert np.isclose(iou_our, iou_ref, rtol=0, atol=1e-9)
