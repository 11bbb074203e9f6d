"""remat_trunk (jax.checkpoint on every trunk block) must be BIT-identical
to the baseline: same param tree (block names are pinned explicitly in
models/unet_res.py so nn.remat cannot rename them), same forward, same
gradients. The knob only changes WHERE activations come from in the
backward (recomputed vs stored) — the TPU-native HBM <-> FLOPs trade."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes


def test_remat_param_tree_identical(rng):
    size = 32
    base = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0)
    rem = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0, remat_trunk=True)
    x = jnp.asarray(rng.standard_normal((1, size, size, 1)).astype(np.float32))
    hebb = base.initial_zero_hebb(1)
    vs = base.init(jax.random.PRNGKey(0), x, hebb)
    vs_r = rem.init(jax.random.PRNGKey(0), x, hebb)
    # pinned names keep the tree stable -> checkpoints load either way
    assert jax.tree.map(lambda a: a.shape, vs) == jax.tree.map(lambda a: a.shape, vs_r)
    for a, b in zip(jax.tree.leaves(vs), jax.tree.leaves(vs_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_forward_and_grads_bit_identical(rng):
    size = 32
    base = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0)
    rem = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0, remat_trunk=True)
    x = jnp.asarray(rng.standard_normal((1, size, size, 1)).astype(np.float32))
    tgt = jnp.asarray((rng.random((1, size, size)) > 0.5).astype(np.float32))
    hebb = base.initial_zero_hebb(1)
    vs = base.init(jax.random.PRNGKey(0), x, hebb)

    o1 = jax.jit(lambda v: base.apply(v, x, hebb))(vs)
    o2 = jax.jit(lambda v: rem.apply(v, x, hebb))(vs)
    np.testing.assert_array_equal(np.asarray(o2.activ), np.asarray(o1.activ))
    np.testing.assert_array_equal(np.asarray(o2.activout), np.asarray(o1.activout))
    np.testing.assert_array_equal(np.asarray(o2.hebb), np.asarray(o1.hebb))

    def loss(m):
        def f(p):
            out = m.apply({"params": p}, x, hebb)
            return jnp.mean((out.activout - tgt) ** 2)
        return f

    g1 = jax.jit(jax.grad(loss(base)))(vs["params"])
    g2 = jax.jit(jax.grad(loss(rem)))(vs["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_remat_train_mode_dropout_replay(rng):
    """nn.remat replays the dropout rng streams in the recompute, so the
    train-mode forward is bit-identical to the stored-activation model."""
    size = 32
    base = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.5)
    rem = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.5, remat_trunk=True)
    x = jnp.asarray(rng.standard_normal((2, size, size, 1)).astype(np.float32))
    hebb = base.initial_zero_hebb(2)
    vs = base.init(jax.random.PRNGKey(0), x, hebb)
    kw = dict(train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    o1 = base.apply(vs, x, hebb, **kw)
    o2 = rem.apply(vs, x, hebb, **kw)
    np.testing.assert_array_equal(np.asarray(o2.activout), np.asarray(o1.activout))


def test_remat_composes_with_fold_hires(rng):
    """remat wraps the folded block variants too (the lane-scale config)."""
    size = 32
    base = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0, fold_hires=True)
    rem = UNetPRes(nbf=size, neurons=4, dropout_ratio=0.0, fold_hires=True,
                   remat_trunk=True)
    x = jnp.asarray(rng.standard_normal((1, size, size, 1)).astype(np.float32))
    hebb = base.initial_zero_hebb(1)
    vs = base.init(jax.random.PRNGKey(0), x, hebb)
    o1 = base.apply(vs, x, hebb)
    o2 = rem.apply(vs, x, hebb)
    np.testing.assert_array_equal(np.asarray(o2.activout), np.asarray(o1.activout))


def test_remat_composes_with_dp_mesh(rng):
    """remat_trunk under shard_map DP (the production lane-scale config) is
    bit-identical to the stored-activation DP run: same sharded epoch losses
    and same (replicated) updated params."""
    from plastic_unet_tpu.parallel import make_dp_epoch_fn, make_mesh, shard_stream
    from plastic_unet_tpu.train.loop import create_train_state
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    size, D = 16, 4
    mesh = make_mesh(D)
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    X = jnp.asarray(rng.standard_normal((16, size, size, 1)).astype(np.float32))
    Y = jnp.asarray((rng.random((16, size, size)) > 0.5).astype(np.float32))
    Xs, Ys = shard_stream(X, Y, mesh, lanes_per_device=1)

    outs = []
    for remat in (False, True):
        model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0,
                         nbf=size, remat_trunk=remat)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (size, size, 1), lanes=D)
        s, losses = make_dp_epoch_fn(model, tx, mesh)(state, Xs, Ys, jax.random.PRNGKey(1))
        outs.append((s, losses))
    (s1, l1), (s2, l2) = outs
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(s2.hebb), np.asarray(s1.hebb))


def test_remat_rejected_for_classic_arch():
    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.train.driver import build_model

    cfg = TrainConfig(arch="unet", remat_trunk=True)
    with pytest.raises(ValueError, match="remat_trunk"):
        build_model(cfg)
