"""Data-parallel training on the 8-virtual-device CPU mesh: sharded epochs
must run, keep params replicated, and (in per-device trace mode) match
single-device lane training exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.parallel import make_dp_epoch_fn, make_mesh, shard_stream
from plastic_unet_tpu.train.loop import TrainState, create_train_state, make_epoch_fn, reshape_stream
from plastic_unet_tpu.train.optimizer import adam_step_lr

SIZE = 16


def _setup(lanes_total, rng, n_samples=16):
    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    tx = adam_step_lr(1e-3, 0.666, 1e6)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (SIZE, SIZE, 1), lanes=lanes_total)
    X = rng.standard_normal((n_samples, SIZE, SIZE, 1)).astype(np.float32)
    Y = (rng.random((n_samples, SIZE, SIZE)) > 0.5).astype(np.float32)
    return model, tx, state, X, Y


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("trace_mode", ["per_device", "pmean"])
def test_dp_epoch_runs(trace_mode, rng):
    mesh = make_mesh(4)
    model, tx, state, X, Y = _setup(4, rng)
    Xs, Ys = shard_stream(jnp.asarray(X), jnp.asarray(Y), mesh, lanes_per_device=1)
    assert Xs.shape == (4, 4, SIZE, SIZE, 1)
    epoch_fn = make_dp_epoch_fn(model, tx, mesh, trace_mode=trace_mode)
    new_state, losses = epoch_fn(state, Xs, Ys, jax.random.PRNGKey(1))
    assert losses.shape == (4,)
    assert np.all(np.isfinite(np.asarray(losses)))
    assert int(new_state.step) == 4
    if trace_mode == "pmean":
        h = np.asarray(new_state.hebb)
        np.testing.assert_allclose(h, np.broadcast_to(h[:1], h.shape), atol=1e-6)


def test_dp_matches_single_device_lanes(rng):
    """DP over D devices with per-device traces == single-device training
    with D lanes (same grads: lane-mean == pmean of per-device means)."""
    D = 4
    mesh = make_mesh(D)
    model, tx, state, X, Y = _setup(D, rng)

    # single-device lane run
    Xl, Yl = reshape_stream(jnp.asarray(X), jnp.asarray(Y), lanes=D)
    s1, losses1 = make_epoch_fn(model, tx, lanes=D, donate=False)(state, Xl, Yl, jax.random.PRNGKey(1))

    # data-parallel run (1 lane per device)
    Xs, Ys = shard_stream(jnp.asarray(X), jnp.asarray(Y), mesh, lanes_per_device=1)
    s2, losses2 = make_dp_epoch_fn(model, tx, mesh)(state, Xs, Ys, jax.random.PRNGKey(1))

    np.testing.assert_allclose(np.asarray(losses2), np.asarray(losses1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.hebb), np.asarray(s1.hebb), atol=1e-5)


def test_multislice_mesh_dp(rng):
    """2-D (dcn, data) mesh: 2 virtual slices x 4 devices. Gradients pmean
    over both axes; result matches single-device 8-lane training."""
    from plastic_unet_tpu.parallel import DATA_AXIS, DCN_AXIS, make_multislice_mesh

    mesh = make_multislice_mesh(2, 4)
    assert mesh.axis_names == (DCN_AXIS, DATA_AXIS)
    model, tx, state, X, Y = _setup(8, rng)

    Xl, Yl = reshape_stream(jnp.asarray(X), jnp.asarray(Y), lanes=8)
    s1, losses1 = make_epoch_fn(model, tx, lanes=8, donate=False)(state, Xl, Yl, jax.random.PRNGKey(1))

    Xs, Ys = shard_stream(jnp.asarray(X), jnp.asarray(Y), mesh, lanes_per_device=1)
    s2, losses2 = make_dp_epoch_fn(model, tx, mesh, axes=(DCN_AXIS, DATA_AXIS))(state, Xs, Ys, jax.random.PRNGKey(1))

    np.testing.assert_allclose(np.asarray(losses2), np.asarray(losses1), atol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_params_stay_replicated(rng):
    mesh = make_mesh(2)
    model, tx, state, X, Y = _setup(2, rng, n_samples=4)
    Xs, Ys = shard_stream(jnp.asarray(X), jnp.asarray(Y), mesh, lanes_per_device=1)
    new_state, _ = make_dp_epoch_fn(model, tx, mesh)(state, Xs, Ys, jax.random.PRNGKey(1))
    w = new_state.params["w"]
    assert w.sharding.is_fully_replicated


def test_shuffle_mode_runs(tmp_path, rng):
    """cfg.shuffle permutes the stream per epoch and still trains."""
    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.train.driver import start_train

    x_train, x_valid, y_train, y_valid = synthetic_split(8, 4, size=16, seed=9)
    cfg = TrainConfig(out_dir=str(tmp_path / "o"), epochs=2, val_every=1, save_every=2,
                      im_width=16, im_height=16, neurons=2, shuffle=True,
                      matmul_precision="parity")
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert len(result.all_losses) == 16
    assert np.all(np.isfinite(result.all_losses))


def test_shard_local_shuffle(rng):
    """The DP shuffle permutes each device's lane block locally: output
    sharding identical to input, and every device's shard holds exactly the
    same multiset of samples before and after (no cross-shard movement)."""
    from plastic_unet_tpu.parallel.dp import make_shard_shuffle_fn

    mesh = make_mesh(8)
    X = rng.standard_normal((32, 4, 4, 1)).astype(np.float32)
    Y = (rng.random((32, 4, 4)) > 0.5).astype(np.float32)
    Xs, Ys = shard_stream(jnp.asarray(X), jnp.asarray(Y), mesh, lanes_per_device=2)
    assert Xs.shape == (2, 16, 4, 4, 1)
    shuffle = make_shard_shuffle_fn(mesh)
    Xp, Yp = shuffle(Xs, Ys, jax.random.PRNGKey(3))

    assert Xp.sharding == Xs.sharding and Yp.sharding == Ys.sharding
    changed = False
    for before, after in zip(Xs.addressable_shards, Xp.addressable_shards):
        assert before.device == after.device
        a = np.asarray(before.data).reshape(-1, 16)
        b = np.asarray(after.data).reshape(-1, 16)
        # same multiset of rows per device
        np.testing.assert_array_equal(
            np.sort(a.sum(axis=1)), np.sort(b.sum(axis=1))
        )
        a_sorted = a[np.lexsort(a.T)]
        b_sorted = b[np.lexsort(b.T)]
        np.testing.assert_array_equal(a_sorted, b_sorted)
        changed = changed or not np.array_equal(a, b)
    assert changed  # at least one device actually permuted

    # X and Y move together: the (img, mask) pairing is preserved
    pairs_before = {
        (float(np.sum(x)), float(np.sum(y)))
        for x, y in zip(np.asarray(Xs).reshape(-1, 16), np.asarray(Ys).reshape(-1, 16))
    }
    pairs_after = {
        (float(np.sum(x)), float(np.sum(y)))
        for x, y in zip(np.asarray(Xp).reshape(-1, 16), np.asarray(Yp).reshape(-1, 16))
    }
    assert pairs_before == pairs_after

    # collective-free: the lowered HLO contains no cross-device ops
    hlo = shuffle.lower(Xs, Ys, jax.random.PRNGKey(3)).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo


def test_driver_dp_shuffle_training(tmp_path):
    """cfg.devices>1 + cfg.shuffle trains through the shard-local shuffle."""
    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.train.driver import start_train

    x_train, x_valid, y_train, y_valid = synthetic_split(16, 4, size=16, seed=11)
    cfg = TrainConfig(out_dir=str(tmp_path / "dps"), epochs=2, val_every=2, save_every=2,
                      im_width=16, im_height=16, neurons=2, devices=4, lanes=1,
                      shuffle=True, matmul_precision="parity")
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert len(result.all_losses) == 8
    assert np.all(np.isfinite(result.all_losses))


def test_multihost_lane_blocks_match_global(rng):
    """The multi-process branch's layout math: per-process local lane blocks,
    stacked along the lane axis, must equal shard_stream's global assignment
    (lane l = contiguous global chunk [l*S, (l+1)*S))."""
    from plastic_unet_tpu.parallel.multihost import local_lane_block

    total_lanes, pc = 8, 2
    X = rng.standard_normal((32, 4, 4, 1)).astype(np.float32)
    Y = (rng.random((32, 4, 4)) > 0.5).astype(np.float32)
    mesh = make_mesh(8)
    Xg, Yg = shard_stream(jnp.asarray(X), jnp.asarray(Y), mesh, lanes_per_device=1)

    per = -(-X.shape[0] // pc)
    lanes_local = total_lanes // pc
    for p in range(pc):
        Xl, Yl = local_lane_block(X[p * per : (p + 1) * per], Y[p * per : (p + 1) * per], pc, total_lanes)
        np.testing.assert_array_equal(
            np.asarray(Xl), np.asarray(Xg[:, p * lanes_local : (p + 1) * lanes_local])
        )
        np.testing.assert_array_equal(
            np.asarray(Yl), np.asarray(Yg[:, p * lanes_local : (p + 1) * lanes_local])
        )


def test_multihost_helpers_single_process(rng):
    from plastic_unet_tpu.parallel import make_mesh, process_local_slice, stage_global_stream

    sl = process_local_slice(100)
    assert sl == slice(0, 100)  # single process owns everything
    mesh = make_mesh(4)
    X = rng.standard_normal((16, 8, 8, 1)).astype(np.float32)
    Y = (rng.random((16, 8, 8)) > 0.5).astype(np.float32)
    Xs, Ys = stage_global_stream(X, Y, mesh)
    assert Xs.shape == (4, 4, 8, 8, 1)


def test_driver_multi_device_training(tmp_path):
    """cfg.devices > 1 routes start_train through the DP epoch on the
    virtual mesh (full driver path: shard, train, validate, checkpoint)."""
    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.train.driver import start_train

    x_train, x_valid, y_train, y_valid = synthetic_split(16, 4, size=16, seed=10)
    cfg = TrainConfig(out_dir=str(tmp_path / "dp"), epochs=2, val_every=1, save_every=2,
                      im_width=16, im_height=16, neurons=2, devices=4, lanes=1,
                      trace_mode="pmean", matmul_precision="parity")
    result = start_train(x_train, x_valid, y_train, y_valid, cfg)
    assert len(result.all_losses) == 8  # 16 samples / 4 devices = 4 steps x 2 epochs
    assert np.all(np.isfinite(result.all_losses))
    assert result.state.hebb.shape[0] == 4
    import os
    assert os.path.exists(os.path.join(cfg.out_dir, "train_data.hdf5"))


def test_sharded_inference_matches_single_device(rng):
    """predict_masks(mesh=...) shards each chunk's batch axis over the data
    mesh — pure batch partitioning, results must equal single-device."""
    from plastic_unet_tpu.eval.evaluate import predict_masks
    from plastic_unet_tpu.submit.inference import predict_masks_tta

    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, dropout_ratio=0.0, nbf=SIZE)
    x0 = jnp.zeros((1, SIZE, SIZE, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]
    X = rng.standard_normal((20, SIZE, SIZE, 1)).astype(np.float32)

    mesh = make_mesh(4)
    single = np.asarray(predict_masks(model, params, X, chunk=8))
    sharded = np.asarray(predict_masks(model, params, X, chunk=8, mesh=mesh))
    np.testing.assert_allclose(sharded, single, atol=1e-6)

    t_single = np.asarray(predict_masks_tta(model, params, X, transforms=("identity", "hflip"), chunk=8))
    t_sharded = np.asarray(
        predict_masks_tta(model, params, X, transforms=("identity", "hflip"), chunk=8, mesh=mesh)
    )
    np.testing.assert_allclose(t_sharded, t_single, atol=1e-6)

    with pytest.raises(ValueError):
        predict_masks(model, params, X, chunk=6, mesh=mesh)
