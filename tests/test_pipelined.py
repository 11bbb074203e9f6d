"""Pipelined (delayed-gradient) training mode — train/pipelined.py.

The mode relaxes the reference's per-sample params chain (train.py:91-112)
by exactly one sample: forward_i and grads_i are evaluated at the params
with updates 0..i-2 applied, and update_i applies grads_{i-1}. The pinned
semantics: bit-equivalence with an explicit pending-grads reference (plain
value_and_grad in a scan, no vjp/closure_convert machinery), S=1 degeneration
to the exact sequential step, trace chaining in stream order, and exactly S
optimizer updates for S samples.

Tolerances: both programs run the same math as different XLA graphs, so
later steps accumulate a few-ULP fusion noise; with SGD (linear in grads)
the end-of-epoch params agree to ~1e-5 absolute. Adam is sign-sensitive at
near-zero gradients (the same reason the torch-trajectory parity tests use
5e-5, tests/test_train_loop.py), so the Adam composition test checks
structure + finiteness rather than tight values.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.ops.losses import bce_logits
from plastic_unet_tpu.train.loop import TrainState, create_train_state, make_epoch_fn
from plastic_unet_tpu.train.optimizer import adam_step_lr
from plastic_unet_tpu.train.pipelined import make_pipelined_epoch_fn

SIZE = 32


def _data(S, lanes=1, seed=7):
    X = jax.random.normal(jax.random.PRNGKey(seed), (S, lanes, SIZE, SIZE, 1))
    Y = (jax.random.uniform(jax.random.PRNGKey(seed + 1), (S, lanes, SIZE, SIZE)) > 0.5).astype(
        jnp.float32
    )
    return X, Y


def _model(**kw):
    return UNetPRes(n_channels=1, n_classes=1, nbf=SIZE, neurons=4, **kw)


def _delayed_reference_fn(model, tx):
    """The pinned semantics, written the obvious way: value_and_grad at the
    current (stale) params inside a scan, with the grads carried one step
    before being applied. No forward/backward splitting."""

    def loss_fn(params, img, mask, hebb, drop_rng):
        out = model.apply(
            {"params": params},
            img,
            jax.lax.stop_gradient(hebb),
            train=True,
            rngs={"dropout": drop_rng},
        )
        return bce_logits(out.activ, mask), out.hebb

    vag = jax.value_and_grad(loss_fn, has_aux=True)

    def apply_update(params, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    @jax.jit
    def run(state: TrainState, X, Y, rng):
        (loss0, hebb), pending = vag(
            state.params, X[0], Y[0], state.hebb, jax.random.fold_in(rng, state.step)
        )
        state = state._replace(hebb=hebb)

        def body(carry, batch):
            st, pend = carry
            img, mask = batch
            (loss, hebb_n), g = vag(
                st.params, img, mask, st.hebb, jax.random.fold_in(rng, st.step + 1)
            )
            new_params, new_opt = apply_update(st.params, st.opt_state, pend)
            return (TrainState(new_params, new_opt, hebb_n, st.step + 1), g), loss

        (state, pending), losses_rest = jax.lax.scan(body, (state, pending), (X[1:], Y[1:]))
        new_params, new_opt = apply_update(state.params, state.opt_state, pending)
        state = TrainState(new_params, new_opt, state.hebb, state.step + 1)
        return state, jnp.concatenate([loss0[None], losses_rest])

    return run


def _max_diff(a, b):
    return max(
        jax.tree.leaves(jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b))
    )


def test_matches_delayed_reference_sgd():
    """Residual-carry implementation == pending-grads reference (SGD keeps
    the comparison linear in the few-ULP graph noise)."""
    model = _model()
    tx = optax.sgd(1e-3)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)
    X, Y = _data(S=6)
    rng = jax.random.PRNGKey(1)

    st_p, losses_p = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    st_r, losses_r = _delayed_reference_fn(model, tx)(state0, X, Y, rng)

    np.testing.assert_allclose(np.asarray(losses_p), np.asarray(losses_r), rtol=0, atol=1e-6)
    assert _max_diff(st_p.params, st_r.params) < 1e-5
    assert int(st_p.step) == int(st_r.step) == 6


def test_first_loss_and_first_forward_are_exact():
    """Sample 0's forward runs at the initial params in BOTH modes, so the
    first loss matches the sequential loop exactly (divergence starts at
    sample 1, whose forward is one update behind)."""
    model = _model()
    tx = optax.sgd(1e-3)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)
    X, Y = _data(S=4)
    rng = jax.random.PRNGKey(1)

    _, losses_p = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    _, losses_s = make_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    np.testing.assert_allclose(float(losses_p[0]), float(losses_s[0]), rtol=0, atol=1e-7)
    # and it IS a different trajectory afterwards (staleness is real)
    assert not np.allclose(np.asarray(losses_p[1:]), np.asarray(losses_s[1:]), rtol=0, atol=0)


def test_s1_degenerates_to_sequential():
    """With one sample there is nothing to overlap: prologue forward +
    drain update == exactly the reference-exact sequential step."""
    model = _model()
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)
    X, Y = _data(S=1)
    rng = jax.random.PRNGKey(1)

    st_p, losses_p = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    st_s, losses_s = make_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    np.testing.assert_allclose(np.asarray(losses_p), np.asarray(losses_s), rtol=0, atol=1e-7)
    assert _max_diff(st_p.params, st_s.params) < 1e-7
    np.testing.assert_array_equal(np.asarray(st_p.hebb), np.asarray(st_s.hebb))


@pytest.mark.parametrize("rule", ["hebb", "oja"])
def test_trace_chains_in_stream_order(rule):
    """The plastic trace chains through the forwards in stream order: the
    trace after the epoch equals replaying the same forwards (same stale
    params, same dropout keys) sample by sample."""
    model = _model(rule=rule)
    tx = optax.sgd(1e-3)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)
    X, Y = _data(S=4)
    rng = jax.random.PRNGKey(1)

    st_p, _ = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    st_r, _ = _delayed_reference_fn(model, tx)(state0, X, Y, rng)
    np.testing.assert_allclose(
        np.asarray(st_p.hebb), np.asarray(st_r.hebb), rtol=0, atol=1e-6
    )


def test_adam_composes_and_counts_updates():
    """S samples -> exactly S Adam/StepLR updates (the drain update counts),
    finite losses, and the same optimizer-state step count as sequential."""
    model = _model()
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)
    X, Y = _data(S=6)
    rng = jax.random.PRNGKey(1)

    st_p, losses_p = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    st_s, _ = make_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    assert np.all(np.isfinite(np.asarray(losses_p)))
    counts_p = [int(x) for x in jax.tree.leaves(st_p.opt_state) if jnp.ndim(x) == 0 and jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)]
    counts_s = [int(x) for x in jax.tree.leaves(st_s.opt_state) if jnp.ndim(x) == 0 and jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)]
    assert counts_p == counts_s  # same number of optimizer steps
    assert int(st_p.step) == 6


def test_lanes_compose():
    """Lane-parallel streams (B>1) pipeline the same way: per-lane traces,
    one delayed update per step on the lane-mean loss."""
    model = _model()
    tx = optax.sgd(1e-3)
    lanes = 2
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=lanes)
    X, Y = _data(S=4, lanes=lanes)
    rng = jax.random.PRNGKey(1)

    st_p, losses_p = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    st_r, losses_r = _delayed_reference_fn(model, tx)(state0, X, Y, rng)
    np.testing.assert_allclose(np.asarray(losses_p), np.asarray(losses_r), rtol=0, atol=1e-6)
    assert _max_diff(st_p.params, st_r.params) < 1e-5
    assert st_p.hebb.shape[0] == lanes


def test_driver_e2e_pipelined(tmp_path):
    """--pipelined through the real driver: trains, writes the reference
    checkpoint artifacts, and counts one loss per sample per epoch."""
    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.train.driver import start_train

    x_train, x_valid, y_train, y_valid = synthetic_split(6, 3, size=SIZE, seed=5)
    cfg = TrainConfig(
        out_dir=str(tmp_path / "out"), epochs=2, lr=3e-4, val_every=1,
        save_every=2, steplr=1e5, im_width=SIZE, im_height=SIZE, im_chan=1,
        neurons=4, pipelined=True,
    )
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert len(result.all_losses) == 12  # 6 samples x 2 epochs
    assert all(np.isfinite(l) for l in result.all_losses)
    import os

    assert os.path.exists(os.path.join(cfg.out_dir, "train_data.hdf5"))


def test_driver_rejects_unsupported_combos(tmp_path):
    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.train.driver import start_train

    x_train, x_valid, y_train, y_valid = synthetic_split(4, 2, size=SIZE, seed=5)
    base = dict(
        out_dir=str(tmp_path / "out"), epochs=1, lr=3e-4, val_every=1,
        save_every=1, steplr=1e5, im_width=SIZE, im_height=SIZE, im_chan=1,
        neurons=4, pipelined=True,
    )
    with pytest.raises(ValueError, match="single-device"):
        start_train(x_train, x_valid, y_train, y_valid, TrainConfig(devices=2, **base))
    with pytest.raises(ValueError, match="multi-epoch"):
        start_train(
            x_train, x_valid, y_train, y_valid, TrainConfig(epochs_per_dispatch=2, **base)
        )


def test_remat_trunk_composes():
    """remat_trunk under the pipelined epoch: same semantics, far smaller
    carried VJP residuals (the backward recomputes block internals), which
    is what makes lane-scale pipelining affordable in HBM. Plain-jit
    forward/grads are bit-identical (tests/test_remat.py); inside the
    pipelined scan the checkpoint regions change XLA's fusion choices, so
    the comparison here is tight-allclose (few-ULP fusion noise), not
    array_equal."""
    tx = optax.sgd(1e-3)
    X, Y = _data(S=4)
    rng = jax.random.PRNGKey(1)

    base = _model(dropout_ratio=0.0)
    rem = _model(dropout_ratio=0.0, remat_trunk=True)
    state0 = create_train_state(base, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)

    st_b, losses_b = make_pipelined_epoch_fn(base, tx, donate=False)(state0, X, Y, rng)
    st_r, losses_r = make_pipelined_epoch_fn(rem, tx, donate=False)(state0, X, Y, rng)
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_r), rtol=0, atol=1e-5)
    assert _max_diff(st_b.params, st_r.params) < 1e-5


def test_bf16_compute_dtype_composes():
    model = _model(compute_dtype=jnp.bfloat16)
    tx = optax.sgd(1e-3)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=1)
    X, Y = _data(S=3)
    rng = jax.random.PRNGKey(1)

    st_p, losses_p = make_pipelined_epoch_fn(model, tx, donate=False)(state0, X, Y, rng)
    st_r, losses_r = _delayed_reference_fn(model, tx)(state0, X, Y, rng)
    assert np.all(np.isfinite(np.asarray(losses_p)))
    np.testing.assert_allclose(
        np.asarray(losses_p), np.asarray(losses_r), rtol=0, atol=5e-3
    )
