"""Training-loop parity: the scan-based lifetime loop must track a torch
loop with reference semantics (per-sample Adam+StepLR, detached hebb carry,
BCE on sigmoid outputs) step for step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.train.loop import TrainState, create_train_state, make_epoch_fn, make_train_step, reshape_stream
from plastic_unet_tpu.train.optimizer import adam_step_lr, step_lr_schedule
from plastic_unet_tpu.utils.torch_interop import flax_params_to_state_dict, state_dict_to_flax_params, unetp_res_name_map

from conftest import has_reference, import_reference_module

torch = pytest.importorskip("torch")

SIZE, NBF, NEURONS, STEPS = 16, 16, 2, 8
LR, GAMMA, STEPLR = 1e-3, 0.5, 3


def test_step_lr_schedule_matches_torch():
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(lin.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, gamma=GAMMA, step_size=STEPLR)
    mine = step_lr_schedule(LR, GAMMA, STEPLR)
    for k in range(12):
        torch_lr = opt.param_groups[0]["lr"]
        assert float(mine(k)) == pytest.approx(torch_lr, rel=1e-6), k
        opt.step()
        sched.step()


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
@pytest.mark.parametrize(
    "rule,patch_conv",
    [("hebb", 0), ("oja", 0), ("hebb", 32)],
    ids=["hebb", "oja", "hebb-patch_conv"],
)
def test_training_trajectory_matches_torch(rule, patch_conv, rng):
    # patch_conv=32 is the benched parity configuration (im2col-forward
    # convs, ops/patch_conv) — same math, matmul-ordered fp32 accumulation;
    # it must track the torch reference within the same tolerances.
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(
        n_channels=1, n_classes=1, device=torch.device("cpu"),
        neurons=NEURONS, dropout_ratio=0.0, nbf=NBF, rule=rule,
    )
    ref_net.train()

    X = rng.standard_normal((STEPS, 1, SIZE, SIZE)).astype(np.float32) * 0.5
    Y = (rng.random((STEPS, 1, SIZE, SIZE)) > 0.5).astype(np.float32)

    # --- torch loop with reference train() semantics (train.py:78-112) ---
    opt = torch.optim.Adam(ref_net.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, gamma=GAMMA, step_size=STEPLR)
    crit = torch.nn.BCELoss()
    params0 = state_dict_to_flax_params(ref_net.state_dict(), unetp_res_name_map())

    hebb = torch.zeros(NBF, NBF)
    torch_losses = []
    for i in range(STEPS):
        opt.zero_grad()
        t_img = torch.from_numpy(X[i][None])
        y_t = torch.from_numpy(Y[i])
        y_pred, hebb = ref_net(t_img, hebb.detach())
        loss = crit(y_pred.view(-1), y_t.view(-1))
        torch_losses.append(loss.item())
        loss.backward()
        opt.step()
        sched.step()
        hebb = hebb.detach()

    # --- my scan loop, same initial weights ---
    model = UNetPRes(
        n_channels=1, n_classes=1, neurons=NEURONS, dropout_ratio=0.0, nbf=NBF, rule=rule,
        patch_conv=patch_conv,
    )
    tx = adam_step_lr(LR, GAMMA, STEPLR)
    state = TrainState(
        params=params0, opt_state=tx.init(params0),
        hebb=model.initial_zero_hebb(1), step=jnp.zeros((), jnp.int32),
    )
    epoch_fn = make_epoch_fn(model, tx, loss_space="probs", donate=False)
    Xs = jnp.asarray(np.transpose(X, (0, 2, 3, 1)))[:, None]  # (S, B=1, H, W, C)
    Ys = jnp.asarray(Y[:, :, :, :, None].squeeze(-1))  # (S, 1, H, W)
    final_state, losses = epoch_fn(state, Xs, Ys, jax.random.PRNGKey(0))

    np.testing.assert_allclose(np.asarray(losses), np.asarray(torch_losses), atol=5e-5)

    # final parameters match torch's
    sd_mine = flax_params_to_state_dict(final_state.params, unetp_res_name_map())
    sd_torch = ref_net.state_dict()
    for k in sd_torch:
        np.testing.assert_allclose(sd_mine[k], sd_torch[k].numpy(), atol=5e-4, err_msg=k)

    # eta must remain exactly .01 (zero-grad preserved behavior)
    np.testing.assert_allclose(np.asarray(final_state.params["eta"]), [0.01], atol=0)


def test_epoch_fn_carries_trace(rng):
    """The hebb trace must evolve within the epoch (train.py:88-99)."""
    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=16)
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
    X = jnp.asarray(rng.standard_normal((4, 1, SIZE, SIZE, 1)).astype(np.float32))
    Y = jnp.asarray((rng.random((4, 1, SIZE, SIZE)) > 0.5).astype(np.float32))
    new_state, losses = make_epoch_fn(model, tx, donate=False)(state, X, Y, jax.random.PRNGKey(1))
    assert losses.shape == (4,)
    assert float(jnp.abs(new_state.hebb).max()) > 0.0
    assert int(new_state.step) == 4


def test_fused_adam_matches_unfused(rng):
    """optax.flatten'd Adam+StepLR (fused=True opt-in; measured-negative on
    TPU, see optimizer.py) is the same elementwise math on a raveled vector —
    trajectories must agree to float tolerance (XLA fuses the flat form
    differently, so last-ULP drift over steps is expected)."""
    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.5, nbf=16)
    X = jnp.asarray(rng.standard_normal((6, 1, SIZE, SIZE, 1)).astype(np.float32))
    Y = jnp.asarray((rng.random((6, 1, SIZE, SIZE)) > 0.5).astype(np.float32))
    results = []
    for fused in (True, False):
        tx = adam_step_lr(LR, GAMMA, STEPLR, fused=fused)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
        s, losses = make_epoch_fn(model, tx, donate=False)(state, X, Y, jax.random.PRNGKey(1))
        results.append((s, np.asarray(losses)))
    (s_f, l_f), (s_u, l_u) = results
    np.testing.assert_allclose(l_f, l_u, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_f.params), jax.tree.leaves(s_u.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_f.hebb), np.asarray(s_u.hebb), atol=1e-5)


def test_rbg_rng_epoch_runs(rng):
    """cfg.rng_impl='rbg': dropout keys from the RBG generator drive the
    same epoch fn (fewer rng ops per step on TPU; stream differs only)."""
    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.5, nbf=16)
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
    X = jnp.asarray(rng.standard_normal((4, 1, SIZE, SIZE, 1)).astype(np.float32))
    Y = jnp.asarray((rng.random((4, 1, SIZE, SIZE)) > 0.5).astype(np.float32))
    key = jax.random.key(1, impl="rbg")
    new_state, losses = make_epoch_fn(model, tx, donate=False)(state, X, Y, key)
    assert np.all(np.isfinite(np.asarray(losses)))
    assert int(new_state.step) == 4


def test_lane_mode_shapes(rng):
    """B>1 lane mode: stream reshapes and runs; one step per B samples."""
    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=16)
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=2)
    X = rng.standard_normal((9, SIZE, SIZE, 1)).astype(np.float32)
    Y = (rng.random((9, SIZE, SIZE)) > 0.5).astype(np.float32)
    Xl, Yl = reshape_stream(jnp.asarray(X), jnp.asarray(Y), lanes=2)
    assert Xl.shape == (4, 2, SIZE, SIZE, 1)  # 9 -> 4 steps x 2 lanes (1 dropped)
    new_state, losses = make_epoch_fn(model, tx, lanes=2, donate=False)(state, Xl, Yl, jax.random.PRNGKey(1))
    assert losses.shape == (4,)
    assert new_state.hebb.shape == (2, NBF, NBF)
