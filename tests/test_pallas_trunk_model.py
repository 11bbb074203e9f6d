"""pallas_trunk=True (fused residual tails) must be a drop-in for the XLA
path: identical param tree AND init values, matching forward and gradients,
and a training step that tracks the XLA step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.train.loop import TrainState, create_train_state, make_epoch_fn
from plastic_unet_tpu.train.optimizer import adam_step_lr

SIZE = 16


@pytest.fixture(autouse=True)
def _force_fusion(monkeypatch):
    """The per-level worth_fusing gate would skip fusion at toy sizes; force
    it on so these tests exercise the fused path."""
    monkeypatch.setenv("PLASTIC_UNET_FUSE_MIN_PIXELS", "0")


def _models(**kw):
    base = dict(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    base.update(kw)
    return (
        UNetPRes(**base),
        UNetPRes(pallas_trunk=True, **base),
    )


def test_param_trees_identical():
    ref, fused = _models()
    x = jnp.zeros((1, SIZE, SIZE, 1))
    h = ref.initial_zero_hebb(1)
    p_ref = ref.init(jax.random.PRNGKey(0), x, h)["params"]
    p_fused = fused.init(jax.random.PRNGKey(0), x, h)["params"]
    flat_ref = jax.tree_util.tree_flatten_with_path(p_ref)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in flat_ref] == [k for k, _ in flat_fused]
    for (k, a), (_, b) in zip(flat_ref, flat_fused):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))


def test_forward_matches_xla_path(rng):
    ref, fused = _models()
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    h = ref.initial_zero_hebb(1)
    params = ref.init(jax.random.PRNGKey(0), x, h)["params"]
    out_ref = ref.apply({"params": params}, x, h)
    out_fused = fused.apply({"params": params}, x, h)
    np.testing.assert_allclose(np.asarray(out_fused.activ), np.asarray(out_ref.activ), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_fused.hebb), np.asarray(out_ref.hebb), atol=1e-4)


def test_gradients_match_xla_path(rng):
    ref, fused = _models()
    x = jnp.asarray(rng.standard_normal((1, SIZE, SIZE, 1)).astype(np.float32))
    y = jnp.asarray((rng.random((1, SIZE, SIZE)) > 0.5).astype(np.float32))
    h = ref.initial_zero_hebb(1)
    params = ref.init(jax.random.PRNGKey(0), x, h)["params"]

    def loss(model, p):
        out = model.apply({"params": p}, x, h, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        from plastic_unet_tpu.ops.losses import bce_logits

        return bce_logits(out.activ, y)

    g_ref = jax.grad(lambda p: loss(ref, p))(params)
    g_fused = jax.grad(lambda p: loss(fused, p))(params)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
    ):
        s = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5 * s, err_msg=str(k))


def test_trajectory_matches_torch_with_fused_trunk(rng):
    """The fused-trunk model must track the torch reference step-for-step
    (same check as test_train_loop.py::test_training_trajectory_matches_torch,
    slightly looser tolerance for the kernel's different fp32 reassociation)."""
    import os

    if not os.path.isdir("/root/reference/src"):
        pytest.skip("reference tree unavailable")
    torch = pytest.importorskip("torch")
    from conftest import import_reference_module

    from plastic_unet_tpu.utils.torch_interop import state_dict_to_flax_params, unetp_res_name_map

    LR, GAMMA, STEPLR, STEPS = 1e-3, 0.5, 3, 8
    ref_mod = import_reference_module("unet.unet_p_res")
    ref_net = ref_mod.UNetpRes(
        n_channels=1, n_classes=1, device=torch.device("cpu"),
        neurons=2, dropout_ratio=0.0, nbf=SIZE, rule="hebb",
    )
    ref_net.train()
    X = rng.standard_normal((STEPS, 1, SIZE, SIZE)).astype(np.float32) * 0.5
    Y = (rng.random((STEPS, 1, SIZE, SIZE)) > 0.5).astype(np.float32)

    opt = torch.optim.Adam(ref_net.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.StepLR(opt, gamma=GAMMA, step_size=STEPLR)
    crit = torch.nn.BCELoss()
    params0 = state_dict_to_flax_params(ref_net.state_dict(), unetp_res_name_map())

    hebb = torch.zeros(SIZE, SIZE)
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

    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0,
                     nbf=SIZE, rule="hebb", pallas_trunk=True)
    tx = adam_step_lr(LR, GAMMA, STEPLR)
    state = TrainState(params=params0, opt_state=tx.init(params0),
                       hebb=model.initial_zero_hebb(1), step=jnp.zeros((), jnp.int32))
    Xs = jnp.asarray(np.transpose(X, (0, 2, 3, 1)))[:, None]
    Ys = jnp.asarray(Y[:, :, :, :])
    final_state, losses = make_epoch_fn(model, tx, loss_space="probs", donate=False)(
        state, Xs, Ys, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(np.asarray(losses), np.asarray(torch_losses), atol=2e-4)


def test_training_step_tracks_xla_path(rng):
    ref, fused = _models()
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    X = jnp.asarray(rng.standard_normal((4, 1, SIZE, SIZE, 1)).astype(np.float32))
    Y = jnp.asarray((rng.random((4, 1, SIZE, SIZE)) > 0.5).astype(np.float32))
    results = []
    for model in (ref, fused):
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1))
        s, losses = make_epoch_fn(model, tx, donate=False)(state, X, Y, jax.random.PRNGKey(1))
        results.append((s, np.asarray(losses)))
    (s_r, l_r), (s_f, l_f) = results
    np.testing.assert_allclose(l_f, l_r, atol=1e-4)
    for a, b in zip(jax.tree.leaves(s_r.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
