"""CoordConv U-Net trainer — the reference's Keras path
(src/coord_conv_script.py:203-259) rebuilt on the TPU stack.

Reproduced behaviors:
  * minibatch training, batch_size=8, Adam(1e-3 Keras default), binary
    cross-entropy on the sigmoid output with Keras's 1e-7 prob clip
  * validation_split=0.1 taken from the END of the array before shuffling
    (Keras model.fit semantics), per-epoch shuffling of the train portion
  * metrics: the mean_iou metric (tf.metrics.mean_iou over thresholds
    0.5:0.05:0.95 with 2 classes, state reset per batch —
    coord_conv_script.py:131-140), reported per epoch as the batch-mean
  * ModelCheckpoint(save_best_only on val_loss) (coord_conv_script.py:212)
  * TimedStopping: stop when the predicted end of the next epoch exceeds
    the budget (coord_conv_script.py:38-56)
  * history dict {loss, val_loss, mean_iou, val_mean_iou} pickled in the
    shape plot_history expects (coord_conv_script.py:222-227)

TPU-native design: one jitted lax.scan over the epoch's minibatches
(shuffle indices computed on device), batched eval. EarlyStopping exists in
the reference but is constructed and left OUT of the callback list
(coord_conv_script.py:211-217); we mirror that by default (patience=None).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from plastic_unet_tpu.models.coord_conv import CoordConvUNet

_KERAS_EPS = 1e-7
_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def keras_bce(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Keras binary_crossentropy: probs clipped to [eps, 1-eps]."""
    p = jnp.clip(probs, _KERAS_EPS, 1.0 - _KERAS_EPS)
    y = targets
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


def keras_mean_iou(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """The reference's mean_iou metric (coord_conv_script.py:131-140):
    tf.metrics.mean_iou (2-class mean IoU from a confusion matrix, state
    reset each call) averaged over thresholds 0.5:0.05:0.95."""
    t = (y_true > 0.5).reshape(-1)

    def per_thr(thr):
        p = (y_pred > thr).reshape(-1)
        tp = jnp.sum(t & p).astype(jnp.float32)
        fp = jnp.sum(~t & p).astype(jnp.float32)
        fn = jnp.sum(t & ~p).astype(jnp.float32)
        tn = jnp.sum(~t & ~p).astype(jnp.float32)
        iou_fg = tp / jnp.maximum(tp + fp + fn, 1.0)
        iou_bg = tn / jnp.maximum(tn + fp + fn, 1.0)
        # tf.metrics.mean_iou averages over classes with nonzero union
        denom = (tp + fp + fn > 0).astype(jnp.float32) + (tn + fp + fn > 0).astype(jnp.float32)
        return (iou_fg + iou_bg) / jnp.maximum(denom, 1.0)

    return jnp.mean(jax.lax.map(per_thr, jnp.asarray(_THRESHOLDS, jnp.float32)))


class CoordState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def construct_model(im_height: int, im_width: int, im_chan: int, with_r: bool = True, scale_input: bool = True):
    """Build + init the CoordConv U-Net (reference construct_model,
    coord_conv_script.py:146-200)."""
    model = CoordConvUNet(im_chan=im_chan, with_r=with_r, scale_input=scale_input)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, im_height, im_width, im_chan)))["params"]
    return model, params


def _make_steps(model, tx):
    @jax.jit
    def epoch_fn(state: CoordState, Xb, Yb):
        """Xb: (NB, B, H, W, C), Yb: (NB, B, H, W, 1) — one epoch of batches."""

        def loss_fn(params, x, y):
            p = model.apply({"params": params}, x, train=True)
            return keras_bce(p, y), p

        def body(carry, batch):
            x, y = batch
            (loss, p), grads = jax.value_and_grad(loss_fn, has_aux=True)(carry.params, x, y)
            updates, opt_state = tx.update(grads, carry.opt_state, carry.params)
            params = optax.apply_updates(carry.params, updates)
            return CoordState(params, opt_state, carry.step + 1), (loss, keras_mean_iou(y, p))

        state, (losses, ious) = jax.lax.scan(body, state, (Xb, Yb))
        return state, jnp.mean(losses), jnp.mean(ious)

    @jax.jit
    def eval_fn(params, X, Y):
        """Whole-validation-set eval in one batch (keeps remainders)."""
        p = model.apply({"params": params}, X, train=False)
        return keras_bce(p, Y), keras_mean_iou(Y, p)

    return epoch_fn, eval_fn


def _batchify(X, Y, batch_size):
    """Full batches only (the scan needs uniform shapes); the remainder is
    dropped for the epoch — a minor deviation from Keras, which runs a final
    partial batch. Per-epoch shuffling means all samples are seen across
    epochs."""
    nb = X.shape[0] // batch_size
    n = nb * batch_size
    return (
        X[:n].reshape(nb, batch_size, *X.shape[1:]),
        Y[:n].reshape(nb, batch_size, *Y.shape[1:]),
        nb,
    )


def do_training(
    model,
    params,
    X_train: np.ndarray,
    Y_train: np.ndarray,
    epochs: int,
    max_train_time: float,
    model_file: str,
    batch_size: int = 8,
    validation_split: float = 0.1,
    lr: float = 1e-3,
    seed: int = 0,
    verbose: int = 0,
):
    """Train with model.fit semantics (reference do_training,
    coord_conv_script.py:207-229). Returns the history dict."""
    print("Training started at: %d sec and set to be run for: %d sec" % (time.time(), max_train_time))
    stop_time = time.time() + max_train_time if max_train_time > 0 else -1

    # Keras validation_split: tail fraction, before shuffling
    n = len(X_train)
    n_val = int(n * validation_split)
    X_tr, Y_tr = X_train[: n - n_val], Y_train[: n - n_val]
    X_va, Y_va = X_train[n - n_val :], Y_train[n - n_val :]

    X_tr = jnp.asarray(X_tr, jnp.float32)
    Y_tr = jnp.asarray(Y_tr, jnp.float32)
    Xv = jnp.asarray(X_va, jnp.float32)
    Yv = jnp.asarray(Y_va, jnp.float32)

    tx = optax.adam(lr)
    state = CoordState(params, tx.init(params), jnp.zeros((), jnp.int32))
    epoch_fn, eval_fn = _make_steps(model, tx)

    history = {"loss": [], "val_loss": [], "mean_iou": [], "val_mean_iou": []}
    best_val = np.inf
    rng = np.random.default_rng(seed)

    ran_epochs = 0
    for epoch in range(epochs):
        epoch_start = time.time()
        perm = rng.permutation(len(X_tr))
        Xb, Yb, _ = _batchify(X_tr[jnp.asarray(perm)], Y_tr[jnp.asarray(perm)], batch_size)
        state, loss, miou = epoch_fn(state, Xb, Yb)
        val_loss, val_miou = eval_fn(state.params, Xv, Yv)
        loss, miou, val_loss, val_miou = (float(loss), float(miou), float(val_loss), float(val_miou))
        history["loss"].append(loss)
        history["mean_iou"].append(miou)
        history["val_loss"].append(val_loss)
        history["val_mean_iou"].append(val_miou)
        ran_epochs = epoch + 1
        if verbose:
            print(f"epoch {epoch + 1}: loss={loss:.4f} mean_iou={miou:.4f} val_loss={val_loss:.4f} val_mean_iou={val_miou:.4f}")

        # ModelCheckpoint(save_best_only): monitor val_loss
        if val_loss < best_val:
            best_val = val_loss
            save_coord_model(model_file, state.params)

        # TimedStopping: predicted next-epoch end exceeds the budget
        epoch_time = time.time() - epoch_start
        if stop_time > 0 and (epoch_time + time.time()) >= stop_time:
            print("Training terminated due to the time limits............")
            break

    print("Traing Complete! In: %d epochs" % ran_epochs)
    final_file = model_file + "_final"
    save_coord_model(final_file, state.params)

    history_file_name = final_file + "_history.pickle"
    with open(history_file_name, "wb") as file_pi:
        pickle.dump(history, file_pi)
    print("History dump Complete to file: ", history_file_name)
    return state.params, history


def save_coord_model(path: str, params) -> None:
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_coord_model(path: str, im_height: int, im_width: int, im_chan: int, with_r: bool = True):
    from flax import serialization

    model, params0 = construct_model(im_height, im_width, im_chan, with_r)
    with open(path, "rb") as f:
        params = serialization.from_bytes(params0, f.read())
    return model, params


def start_prediction(model, params, X_test: np.ndarray, sizes_test, batch_size: int = 8, verbose: int = 0):
    """Predict + resize back to original sizes (reference start_prediction,
    coord_conv_script.py:266-299). X_test: (N, H, W, C)."""
    from plastic_unet_tpu.data.images import _resize_bilinear

    X = jnp.asarray(X_test, jnp.float32)
    preds = []
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    for i in range(0, len(X), 64):
        preds.append(np.asarray(apply(params, X[i : i + 64])))
    preds = np.concatenate(preds, axis=0)[..., 0]
    out = []
    for i in range(len(preds)):
        h, w = sizes_test[i]
        m = preds[i]
        out.append(m if m.shape == (h, w) else _resize_bilinear(m, (h, w)))
    print("Prediction complete! Output images shape:", out[0].shape)
    return out
