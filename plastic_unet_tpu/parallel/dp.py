"""Data-parallel lifetime training over a device mesh (shard_map + psum).

The hebb trace is *sequential state* (sample n+1 depends on n), which the
single-stream reference never had to shard. Two explicit trace-coherence
modes (SURVEY.md §2.3):

  * 'per_device' (faithful): every device (and lane) carries its own
    independent lifetime trace over its shard of the sample stream — the
    reference's "one stream per process" semantics, D/B-fold throughput.
  * 'pmean' (throughput): traces are additionally averaged across the data
    axis every step, keeping one coherent trace fleet-wide (BASELINE.json's
    "coherent per-device Hebbian traces").

Gradients are pmean'd across the data axis each step (ICI all-reduce);
parameters and optimizer state stay replicated, so every device applies the
identical Adam update — verified equivalent to single-device lane training
in tests/test_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plastic_unet_tpu.ops.losses import bce_logits, bce_probs
from plastic_unet_tpu.parallel.mesh import DATA_AXIS
from plastic_unet_tpu.train.loop import TrainState


def make_dp_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    loss_space: str = "logits",
    trace_mode: str = "per_device",
    axes: tuple = (DATA_AXIS,),
) -> Callable:
    from plastic_unet_tpu.ops.patch_conv import gate_state

    return _make_dp_epoch_fn_cached(
        model, tx, mesh, loss_space, trace_mode, tuple(axes), gate_state()
    )


@functools.lru_cache(maxsize=32)
def _make_dp_epoch_fn_cached(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_space: str,
    trace_mode: str,
    axes: tuple,
    _gates: tuple,
) -> Callable:
    """Build the jitted data-parallel whole-epoch function (memoized on
    the hashable (model, tx, mesh, ..., patch_conv.gate_state()) key —
    repeated driver invocations with the same config reuse traced
    executables, see train.loop).

    Signature: (state, X, Y, rng) -> (state, losses)
      X: (S, D*L, H, W, C), Y: (S, D*L, H, W) with the lane axis sharded
      over the mesh 'data' axis (L = lanes per device); state.hebb is
      (D*L, nbf, nbf), likewise sharded; params/opt_state replicated.
    Per step: one Adam update from the pmean'd gradient of the lane-mean
    loss. Returned losses (S,) are the global per-step mean.
    """
    if trace_mode not in ("per_device", "pmean"):
        raise ValueError(f"unknown trace_mode {trace_mode!r}")
    axes = tuple(axes)
    lane_spec = axes if len(axes) > 1 else axes[0]

    def loss_fn(params, img, mask, hebb, drop_rng):
        out = model.apply(
            {"params": params},
            img,
            jax.lax.stop_gradient(hebb),
            train=True,
            rngs={"dropout": drop_rng},
        )
        loss = bce_probs(out.activout, mask) if loss_space == "probs" else bce_logits(out.activ, mask)
        return loss, out.hebb

    def shard_body(params, opt_state, hebb, step, Xs, Ys, rng):
        """Runs per device. Xs: (S, L, H, W, C) local shard."""

        def body(carry, batch):
            params, opt_state, hebb, step = carry
            img, mask = batch
            drop_rng = jax.random.fold_in(jax.random.fold_in(rng, step), jax.lax.axis_index(axes))
            (loss, new_hebb), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, img, mask, hebb, drop_rng)
            grads = jax.lax.pmean(grads, axes)
            loss = jax.lax.pmean(loss, axes)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if trace_mode == "pmean":
                new_hebb = jnp.broadcast_to(
                    jax.lax.pmean(jnp.mean(new_hebb, axis=0, keepdims=True), axes), new_hebb.shape
                )
            return (new_params, new_opt, new_hebb, step + 1), loss

        (params, opt_state, hebb, step), losses = jax.lax.scan(body, (params, opt_state, hebb, step), (Xs, Ys))
        return params, opt_state, hebb, step, losses

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(lane_spec), P(), P(None, lane_spec), P(None, lane_spec), P()),
        out_specs=(P(), P(), P(lane_spec), P(), P()),
        check_vma=False,  # params provably replicated via pmean'd grads
    )

    @jax.jit
    def epoch(state: TrainState, X, Y, rng):
        params, opt_state, hebb, step, losses = sharded(state.params, state.opt_state, state.hebb, state.step, X, Y, rng)
        return TrainState(params, opt_state, hebb, step), losses

    return epoch


def make_dp_multi_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    loss_space: str = "logits",
    trace_mode: str = "per_device",
    axes: tuple = (DATA_AXIS,),
    shuffle: bool = False,
    augment: bool = False,
) -> Callable:
    from plastic_unet_tpu.ops.patch_conv import gate_state

    return _make_dp_multi_epoch_fn_cached(
        model, tx, mesh, loss_space, trace_mode, tuple(axes), shuffle, augment,
        gate_state(),
    )


@functools.lru_cache(maxsize=32)
def _make_dp_multi_epoch_fn_cached(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_space: str,
    trace_mode: str,
    axes: tuple,
    shuffle: bool,
    augment: bool,
    _gates: tuple,
) -> Callable:
    """Multi-epoch dispatch (cfg.epochs_per_dispatch) for the DATA-PARALLEL
    path: an outer `lax.scan` over K epochs runs entirely inside one
    shard_map dispatch — per epoch: shard-local shuffle, device-side
    augmentation, trace re-zero (train.py:88), then the per-step scan with
    pmean'd gradients. Bit-identical to K single-epoch DP dispatches
    (tests/test_multi_epoch.py::test_dp_chunks_bit_identical):

      * shuffle reproduces make_shard_shuffle_fn exactly (same per-device
        fold_in(key, axis_index) + permutation of the local (S*L) block);
      * augmentation reproduces the driver's global-flatten semantics: the
        per-epoch path flattens the (S, D*L) stream row-major and
        augment_stream splits the key once per global sample, so each
        device regenerates the full split and gathers the keys for ITS
        lane block (sample s, local lane l on device d -> global index
        s*D*L + d*L + l).

    Signature: (state, X, Y, epoch_rngs, perm_keys, aug_keys)
                 -> (state, losses (K, S))  — same contract as
    train.loop.make_multi_epoch_fn, with X/Y lane-sharded over the mesh.
    """
    import numpy as np

    from plastic_unet_tpu.ops.augment import random_flip_rotate

    if trace_mode not in ("per_device", "pmean"):
        raise ValueError(f"unknown trace_mode {trace_mode!r}")
    axes = tuple(axes)
    lane_spec = axes if len(axes) > 1 else axes[0]
    n_devices = int(np.prod([mesh.shape[a] for a in axes]))

    def loss_fn(params, img, mask, hebb, drop_rng):
        out = model.apply(
            {"params": params},
            img,
            jax.lax.stop_gradient(hebb),
            train=True,
            rngs={"dropout": drop_rng},
        )
        loss = bce_probs(out.activout, mask) if loss_space == "probs" else bce_logits(out.activ, mask)
        return loss, out.hebb

    def shard_run(params, opt_state, hebb0, step, Xs, Ys, epoch_rngs, perm_keys, aug_keys):
        """Per device. Xs: (S, L, H, W, C) local shard; keys: (K,) each."""
        s_steps, l_lanes = Xs.shape[0], Xs.shape[1]
        dev = jax.lax.axis_index(axes)

        def epoch_body(carry, per_epoch):
            params, opt_state, hebb, step = carry
            erng, pkey, akey = per_epoch
            Xe, Ye = Xs, Ys
            if shuffle:
                k = jax.random.fold_in(pkey, dev)
                perm = jax.random.permutation(k, s_steps * l_lanes)

                def apply_perm(a):
                    flat = a.reshape((s_steps * l_lanes,) + a.shape[2:])
                    return flat[perm].reshape(a.shape)

                Xe, Ye = apply_perm(Xe), apply_perm(Ye)
            if augment:
                keys_all = jax.random.split(akey, s_steps * n_devices * l_lanes)
                idx = (
                    jnp.arange(s_steps)[:, None] * (n_devices * l_lanes)
                    + dev * l_lanes
                    + jnp.arange(l_lanes)[None, :]
                ).reshape(-1)
                keys_local = keys_all[idx]
                Xf = Xe.reshape((s_steps * l_lanes,) + Xe.shape[2:])
                Yf = Ye.reshape((s_steps * l_lanes,) + Ye.shape[2:])
                Xa, Ya = jax.vmap(lambda kk, x, y: random_flip_rotate(kk, x, y, True))(
                    keys_local, Xf, Yf
                )
                Xe = Xa.reshape(Xe.shape)
                Ye = Ya.reshape(Ye.shape)
            hebb = jnp.zeros_like(hebb)  # fresh trace per epoch (train.py:88)

            def body(c, batch):
                params, opt_state, hebb, step = c
                img, mask = batch
                drop_rng = jax.random.fold_in(jax.random.fold_in(erng, step), dev)
                (loss, new_hebb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, img, mask, hebb, drop_rng
                )
                grads = jax.lax.pmean(grads, axes)
                loss = jax.lax.pmean(loss, axes)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                if trace_mode == "pmean":
                    new_hebb = jnp.broadcast_to(
                        jax.lax.pmean(jnp.mean(new_hebb, axis=0, keepdims=True), axes),
                        new_hebb.shape,
                    )
                return (new_params, new_opt, new_hebb, step + 1), loss

            (params, opt_state, hebb, step), losses = jax.lax.scan(
                body, (params, opt_state, hebb, step), (Xe, Ye)
            )
            return (params, opt_state, hebb, step), losses

        (params, opt_state, hebb, step), losses = jax.lax.scan(
            epoch_body, (params, opt_state, hebb0, step), (epoch_rngs, perm_keys, aug_keys)
        )
        return params, opt_state, hebb, step, losses

    sharded = jax.shard_map(
        shard_run,
        mesh=mesh,
        in_specs=(P(), P(), P(lane_spec), P(), P(None, lane_spec), P(None, lane_spec), P(), P(), P()),
        out_specs=(P(), P(), P(lane_spec), P(), P()),
        check_vma=False,  # params provably replicated via pmean'd grads
    )

    @jax.jit
    def run(state: TrainState, X, Y, epoch_rngs, perm_keys, aug_keys):
        params, opt_state, hebb, step, losses = sharded(
            state.params, state.opt_state, state.hebb, state.step, X, Y,
            epoch_rngs, perm_keys, aug_keys,
        )
        return TrainState(params, opt_state, hebb, step), losses

    return run


def make_shard_shuffle_fn(mesh: Mesh, axes: tuple = (DATA_AXIS,)) -> Callable:
    """Jitted shard-local epoch shuffle: (X, Y, key) -> (X', Y') where each
    device independently permutes its own (S, L) sample block.

    The naive alternative — a single global permutation of the flattened
    (S·D·L) stream — gathers and reshards the full epoch across the mesh
    every epoch, eating the DP throughput win. Shuffling shard-locally keeps
    the op collective-free: input and output shardings are identical and no
    sample ever crosses a device boundary (asserted in
    tests/test_parallel.py::test_shard_local_shuffle).
    """
    axes = tuple(axes)
    lane_spec = axes if len(axes) > 1 else axes[0]

    def local_shuffle(X, Y, key):
        # X: (S, L, ...) — this device's shard. Independent key per device.
        key = jax.random.fold_in(key, jax.lax.axis_index(axes))
        s, l = X.shape[0], X.shape[1]
        perm = jax.random.permutation(key, s * l)

        def apply(a):
            flat = a.reshape((s * l,) + a.shape[2:])
            return flat[perm].reshape(a.shape)

        return apply(X), apply(Y)

    sharded = jax.shard_map(
        local_shuffle,
        mesh=mesh,
        in_specs=(P(None, lane_spec), P(None, lane_spec), P()),
        out_specs=(P(None, lane_spec), P(None, lane_spec)),
    )
    return jax.jit(sharded)


def shard_stream(X, Y, mesh: Mesh, lanes_per_device: int = 1):
    """Split a sample stream (N, ...) into (S, D*L, ...) with the lane axis
    sharded over all mesh axes, placing each device's lane chunk locally."""
    d = mesh.devices.size
    total_lanes = d * lanes_per_device
    n = X.shape[0]
    s = n // total_lanes
    Xl = X[: s * total_lanes].reshape(total_lanes, s, *X.shape[1:]).swapaxes(0, 1)
    Yl = Y[: s * total_lanes].reshape(total_lanes, s, *Y.shape[1:]).swapaxes(0, 1)
    names = mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(None, names))
    return jax.device_put(Xl, sharding), jax.device_put(Yl, sharding)


def dp_state_sharding(mesh: Mesh):
    """(params/opt_state replicated, hebb lane-sharded, step replicated)."""
    rep = NamedSharding(mesh, P())
    lane = NamedSharding(mesh, P(DATA_AXIS))
    return rep, lane
