"""The lifetime training loop — train-step-in-scan (SURVEY.md §7 stage 4).

Reference semantics being reproduced (src/train.py:78-112):
  per epoch:  hebb <- 0
  per sample: forward(img, stop_grad(hebb)) -> BCE(sigmoid-out, mask)
              -> backward -> Adam step -> StepLR step; hebb carries on.

TPU-native design: the whole epoch is ONE `lax.scan` over the sample stream
resident in HBM, whose body is the fused forward+backward+Adam step. XLA
compiles the body once; there are zero host<->device transfers inside the
epoch (the reference does two per sample, train.py:94-95).

Throughput modes beyond the reference's batch=1 (explicit, documented):
  * lanes (B>1): the sample stream is split into B parallel lifetime
    streams, each carrying its own trace; one Adam step per B samples on
    the lane-mean loss. B=1 reproduces the reference exactly.
  * data parallel: see plastic_unet_tpu.parallel — same step sharded over a
    device mesh with psum'd grads and per-device traces.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from plastic_unet_tpu.ops.losses import bce_logits, bce_probs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    hebb: jax.Array  # (B, nbf, nbf) — one lifetime trace per lane
    step: jax.Array  # global sample-step counter (drives StepLR + dropout rng)


def create_train_state(model, tx: optax.GradientTransformation, rng: jax.Array, sample_shape, lanes: int = 1) -> TrainState:
    """Init model params + optimizer state. sample_shape = (H, W, C)."""
    x0 = jnp.zeros((lanes,) + tuple(sample_shape), jnp.float32)
    hebb0 = model.initial_zero_hebb(lanes)
    variables = model.init(rng, x0, hebb0)
    params = variables["params"]
    return TrainState(params=params, opt_state=tx.init(params), hebb=hebb0, step=jnp.zeros((), jnp.int32))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    loss_space: str = "logits",
) -> Callable:
    """Build the per-step function: (state, (img, mask), base_rng) -> (state, loss).

    img: (B, H, W, C), mask: (B, H, W) or (B, H, W, 1).
    loss_space: 'logits' (stable, default) or 'probs' (reference-exact torch
    BCELoss clamp semantics) — identical values away from saturation.
    """

    def loss_fn(params, img, mask, hebb, drop_rng):
        out = model.apply(
            {"params": params},
            img,
            jax.lax.stop_gradient(hebb),  # detached carry (train.py:97-99)
            train=True,
            rngs={"dropout": drop_rng},
        )
        if loss_space == "probs":
            loss = bce_probs(out.activout, mask)
        else:
            loss = bce_logits(out.activ, mask)
        return loss, out.hebb

    def train_step(state: TrainState, batch, base_rng: jax.Array):
        img, mask = batch
        drop_rng = jax.random.fold_in(base_rng, state.step)
        (loss, new_hebb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img, mask, state.hebb, drop_rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt, new_hebb, state.step + 1), loss

    return train_step


def make_epoch_fn(model, tx: optax.GradientTransformation, *, loss_space: str = "logits", lanes: int = 1, donate: bool = True) -> Callable:
    """Build the jitted whole-epoch function.

    Signature: (state, X, Y, rng) -> (state_with_fresh_hebb_consumed, losses)
      X: (S, B, H, W, C), Y: (S, B, H, W) — S sequential steps of B lanes.
      The hebb trace is re-zeroed by the caller per epoch (train.py:88).
    Returns per-step losses (S,).

    Memoized on (model, tx, ..., patch_conv.gate_state()) — flax Modules
    hash by field values and adam_step_lr returns a cached tx, so repeated
    driver invocations with the same config reuse the SAME jit wrapper (and
    its traced executables) instead of re-tracing every epoch graph
    (~seconds per invocation, PERF.md round-3 e2e attribution). The
    patch_conv experiment knobs are part of the key because they change
    what tracing emits (a gate-sweep probe that flips a knob must re-trace,
    not reuse the stale executable).
    """
    from plastic_unet_tpu.ops.patch_conv import gate_state

    return _make_epoch_fn_cached(model, tx, loss_space, lanes, donate, gate_state())


@functools.lru_cache(maxsize=32)
def _make_epoch_fn_cached(model, tx, loss_space, lanes, donate, _gates):
    step_fn = make_train_step(model, tx, loss_space=loss_space)

    def epoch(state: TrainState, X: jax.Array, Y: jax.Array, rng: jax.Array):
        def body(carry, batch):
            new_state, loss = step_fn(carry, batch, rng)
            return new_state, loss

        return jax.lax.scan(body, state, (X, Y))

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_multi_epoch_fn(
    model,
    tx: optax.GradientTransformation,
    *,
    loss_space: str = "logits",
    shuffle: bool = False,
    augment: bool = False,
    donate: bool = True,
) -> Callable:
    """Fold K epochs into ONE dispatch (PERF.md roadmap #3): an outer
    `lax.scan` over epochs whose body re-zeroes the trace (train.py:88),
    optionally shuffles/augments the stream on device, and runs the inner
    per-sample scan. Amortizes the ~50 ms per-dispatch overhead that
    dominates small (sweep-sized) epochs; at the real 3.2k-sample epoch the
    overhead is <1% and the default epochs_per_dispatch=1 path is identical.

    Signature: (state, X, Y, epoch_rngs, perm_keys, aug_keys)
                 -> (state, losses (K, S))
      X: (S, B, H, W, C); epoch_rngs/perm_keys/aug_keys: (K,) PRNG keys —
      the caller precomputes them in the exact key-derivation order of the
      one-epoch driver path, so the K-epoch dispatch is bit-identical to K
      single-epoch dispatches (pinned by tests/test_multi_epoch.py).

    Memoized like make_epoch_fn, keyed on the patch_conv gate state.
    """
    from plastic_unet_tpu.ops.patch_conv import gate_state

    return _make_multi_epoch_fn_cached(
        model, tx, loss_space, shuffle, augment, donate, gate_state()
    )


@functools.lru_cache(maxsize=32)
def _make_multi_epoch_fn_cached(model, tx, loss_space, shuffle, augment, donate, _gates):
    step_fn = make_train_step(model, tx, loss_space=loss_space)

    def run(state: TrainState, X, Y, epoch_rngs, perm_keys, aug_keys):
        def epoch_body(st, per_epoch):
            erng, pkey, akey = per_epoch
            Xe, Ye = X, Y
            if shuffle:
                flat_x = Xe.reshape((-1,) + Xe.shape[2:])
                flat_y = Ye.reshape((-1,) + Ye.shape[2:])
                perm = jax.random.permutation(pkey, flat_x.shape[0])
                Xe = flat_x[perm].reshape(X.shape)
                Ye = flat_y[perm].reshape(Y.shape)
            if augment:
                from plastic_unet_tpu.ops.augment import augment_stream

                Xa, Ya = augment_stream(
                    akey, Xe.reshape((-1,) + Xe.shape[2:]), Ye.reshape((-1,) + Ye.shape[2:])
                )
                Xe = Xa.reshape(X.shape)
                Ye = Ya.reshape(Y.shape)
            st = st._replace(hebb=jnp.zeros_like(st.hebb))

            def body(carry, batch):
                new_state, loss = step_fn(carry, batch, erng)
                return new_state, loss

            return jax.lax.scan(body, st, (Xe, Ye))

        return jax.lax.scan(epoch_body, state, (epoch_rngs, perm_keys, aug_keys))

    return jax.jit(run, donate_argnums=(0,) if donate else ())


def reshape_stream(X, Y, lanes: int):
    """Split a sample stream (N, ...) into (S, B, ...) lanes for the scan.
    Trailing remainder samples are dropped in lane mode (B>1); B=1 keeps all.
    Lane l processes the contiguous stream chunk [l*S, (l+1)*S) — each lane
    is an independent lifetime, preserving within-lane sequential semantics."""
    n = X.shape[0]
    s = n // lanes
    Xl = X[: s * lanes].reshape(lanes, s, *X.shape[1:]).swapaxes(0, 1)
    Yl = Y[: s * lanes].reshape(lanes, s, *Y.shape[1:]).swapaxes(0, 1)
    return Xl, Yl
