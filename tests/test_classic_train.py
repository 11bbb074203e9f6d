"""Classic-arch (UNetp) TRAINED-path evidence (VERDICT r03 directive 4).

Round 3 proved UNetp forward parity only; if `--arch unet` is exposed as a
trainable config it must be proven trainable: (a) torch training-trajectory
parity at 128 px — the classic model's working geometry (SURVEY.md §2.1) —
through the same scan loop the flagship uses (mirrors
test_train_loop.py::test_training_trajectory_matches_torch against
/root/reference/src/unet/unet_p.py:54-94 + src/train.py:78-112), and (b) a
driver end-to-end train -> checkpoint -> resume -> inference -> submission
run with arch='unet'."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.config import TrainConfig
from plastic_unet_tpu.data.synthetic import synthetic_split, synthetic_tiles
from plastic_unet_tpu.models import UNetP
from plastic_unet_tpu.train.loop import TrainState, make_epoch_fn
from plastic_unet_tpu.train.optimizer import adam_step_lr
from plastic_unet_tpu.utils.torch_interop import (
    flax_params_to_state_dict,
    state_dict_to_flax_params,
    unetp_name_map,
)

from conftest import has_reference, import_reference_module

LR, GAMMA, STEPLR = 1e-3, 0.5, 3


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
@pytest.mark.parametrize("rule", ["hebb", "oja"])
def test_unetp_training_trajectory_matches_torch(rule, rng):
    """Per-step loss AND final-parameter parity vs a torch loop with the
    reference train() semantics (per-sample Adam+StepLR, detached hebb carry,
    BCE on sigmoid outputs), at the classic model's 128-px geometry."""
    torch = pytest.importorskip("torch")
    SIZE = NBF = 128
    STEPS = 4

    ref_mod = import_reference_module("unet.unet_p")
    ref_net = ref_mod.UNetp(
        n_channels=1, n_classes=1, device=torch.device("cpu"), rule=rule, nbf=NBF
    )
    ref_net.train()

    X = rng.standard_normal((STEPS, 1, SIZE, SIZE)).astype(np.float32) * 0.5
    Y = (rng.random((STEPS, 1, SIZE, SIZE)) > 0.5).astype(np.float32)

    # --- torch loop with reference train() semantics (train.py:78-112) ---
    opt = torch.optim.Adam(ref_net.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, gamma=GAMMA, step_size=STEPLR)
    crit = torch.nn.BCELoss()
    params0 = state_dict_to_flax_params(ref_net.state_dict(), unetp_name_map())

    hebb = torch.zeros(NBF, NBF)
    torch_losses = []
    for i in range(STEPS):
        opt.zero_grad()
        y_pred, hebb = ref_net(torch.from_numpy(X[i][None]), hebb.detach())
        loss = crit(y_pred.view(-1), torch.from_numpy(Y[i]).view(-1))
        torch_losses.append(loss.item())
        loss.backward()
        opt.step()
        sched.step()
        hebb = hebb.detach()

    # --- the scan loop, same initial weights ---
    model = UNetP(n_channels=1, n_classes=1, rule=rule, nbf=NBF)
    tx = adam_step_lr(LR, GAMMA, STEPLR)
    state = TrainState(
        params=params0, opt_state=tx.init(params0),
        hebb=model.initial_zero_hebb(1), step=jnp.zeros((), jnp.int32),
    )
    epoch_fn = make_epoch_fn(model, tx, loss_space="probs", donate=False)
    Xs = jnp.asarray(np.transpose(X, (0, 2, 3, 1)))[:, None]  # (S, B=1, H, W, C)
    Ys = jnp.asarray(Y)  # (S, 1, H, W)
    final_state, losses = epoch_fn(state, Xs, Ys, jax.random.PRNGKey(0))

    np.testing.assert_allclose(np.asarray(losses), np.asarray(torch_losses), atol=5e-5)

    sd_mine = flax_params_to_state_dict(final_state.params, unetp_name_map())
    sd_torch = ref_net.state_dict()
    for k in sd_torch:
        np.testing.assert_allclose(sd_mine[k], sd_torch[k].numpy(), atol=5e-4, err_msg=k)

    # eta stays exactly .01 (the zero-grad quirk holds for the classic head too)
    np.testing.assert_allclose(np.asarray(final_state.params["eta"]), [0.01], atol=0)


def test_unetp_driver_e2e(tmp_path):
    """Driver e2e with --arch unet: train -> reference-format checkpoint ->
    .pth resume -> threshold search -> inference -> RLE submission (the full
    pipeline the reference's train.py/infer.py run, on the classic model).
    32 px keeps the pow-2 geometry the classic up/down path needs on CPU."""
    import pandas as pd

    from plastic_unet_tpu.ops.rle import rle_decode
    from plastic_unet_tpu.submit.inference import start_inference
    from plastic_unet_tpu.train.driver import start_train

    SIZE = 32
    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=SIZE, seed=5)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "out"), arch="unet", epochs=2, lr=3e-4,
        val_every=1, save_every=2, steplr=1e5, im_width=SIZE, im_height=SIZE,
        im_chan=1, debug=True, matmul_precision="parity", loss_space="probs",
    )
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert type(result.model).__name__ == "UNetP"
    assert len(result.all_losses) == 16
    assert all(np.isfinite(l) for l in result.all_losses)
    assert len(result.val_accuracies) == 2

    # reference checkpoint artifacts (classic param names in the .pth)
    prefix = os.path.join(cfg.out_dir, "train")
    assert os.path.exists(prefix + "_data.hdf5")
    torch = pytest.importorskip("torch")
    sd = torch.load(prefix + "_net.pth", map_location="cpu")
    assert sd["w"].shape == (SIZE, SIZE)
    assert any(k.startswith("inc.") for k in sd), sorted(sd)[:4]

    # resume from the .pth through the same driver
    cfg2 = TrainConfig(
        out_dir=str(tmp_path / "out2"), arch="unet", epochs=1, lr=3e-4,
        val_every=1, save_every=1, steplr=1e5, im_width=SIZE, im_height=SIZE,
        im_chan=1, load=True, model_path=prefix + "_net.pth",
        matmul_precision="parity", loss_space="probs",
    )
    result2 = start_train(x_train, x_valid, y_train, y_valid, cfg2)
    assert len(result2.all_losses) == 8

    # inference + submission on the trained classic model
    test_imgs, _ = synthetic_tiles(5, size=SIZE, seed=6)
    test_df = pd.DataFrame(index=[f"tile{i}" for i in range(5)])
    test_df["images"] = [t[0] for t in test_imgs]
    subm = start_inference(
        result.model, result.state.params, test_df, x_valid, y_valid,
        out_dir=cfg.out_dir, img_width=SIZE, img_height=SIZE, img_chan=1,
    )
    sub = pd.read_csv(subm, index_col="id", keep_default_na=False)
    assert list(sub.index) == [f"tile{i}" for i in range(5)]
    for rle in sub.rle_mask:
        assert rle_decode("" if pd.isna(rle) else str(rle), (SIZE, SIZE)).shape == (SIZE, SIZE)
