"""eval_net / score_model_best_iou parity vs a torch loop with reference
semantics (zero-trace per-sample eval, eval.py:66-103; logit-space threshold
sweep, eval.py:20-64)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.eval.evaluate import eval_net, score_model_best_iou, threshold_grid
from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.ops.iou import fast_iou_metric, iou_metric_batch
from plastic_unet_tpu.utils.torch_interop import state_dict_to_flax_params, unetp_res_name_map

from conftest import has_reference, import_reference_module

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")

SIZE = 16


@pytest.fixture(scope="module")
def nets():
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(
        n_channels=1, n_classes=1, device=torch.device("cpu"), neurons=2, dropout_ratio=0.0, nbf=SIZE
    )
    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    params = state_dict_to_flax_params(ref_net.state_dict(), unetp_res_name_map())
    return ref_net, model, params


def _val_data(rng, n=12):
    X = rng.standard_normal((n, 1, SIZE, SIZE)).astype(np.float32)
    Y = (rng.random((n, 1, SIZE, SIZE)) > 0.5).astype(np.float32)
    return X, Y


def test_eval_net_matches_torch_loop(nets, rng):
    ref_net, model, params = nets
    X, Y = _val_data(rng)

    # torch loop with reference eval_net semantics
    ref_net.eval()
    crit = torch.nn.BCELoss()
    with torch.no_grad():
        hebb = torch.zeros(SIZE, SIZE)
        total_loss, total_acc = 0.0, 0.0
        for i in range(len(X)):
            pred, _ = ref_net(torch.from_numpy(X[i][None]), hebb)
            pf = pred.view(-1)
            tf = torch.from_numpy(Y[i]).view(-1)
            total_loss += crit(pf, tf).item()
            total_acc += fast_iou_metric(y_pred_in=pf.numpy(), y_true_in=tf.numpy())
    want_acc, want_loss = total_acc / len(X), total_loss / len(X)

    xv = np.transpose(X, (0, 2, 3, 1))
    got_acc, got_loss = eval_net(model, params, xv, Y, chunk=4)
    assert got_acc == pytest.approx(want_acc, abs=1e-5)
    assert got_loss == pytest.approx(want_loss, abs=1e-5)


def test_score_model_best_iou_matches_torch_loop(nets, rng):
    ref_net, model, params = nets
    X, Y = _val_data(rng)

    ref_net.eval()
    with torch.no_grad():
        hebb = torch.zeros(SIZE, SIZE)
        preds = np.stack(
            [ref_net(torch.from_numpy(X[i][None]), hebb)[0].numpy() for i in range(len(X))]
        )
    thresholds = threshold_grid()
    ious = np.array([iou_metric_batch(Y, preds > t) for t in thresholds])
    want_thr = thresholds[int(np.argmax(ious))]
    want_iou = float(ious.max())

    xv = np.transpose(X, (0, 2, 3, 1))
    got_thr, got_iou = score_model_best_iou(model, params, xv, Y, chunk=4)
    assert got_thr == pytest.approx(want_thr, abs=1e-6)
    assert got_iou == pytest.approx(want_iou, abs=1e-5)
