"""Evaluation: zero-trace validation + best-IoU threshold search.

Reference semantics (src/eval.py):
  * eval_net (:66-103): every validation sample is evaluated with a ZERO
    hebb trace (initialized once, returned traces discarded, :81-90 — the
    train/eval trace asymmetry called out in SURVEY.md §2.1); returns
    (mean pixel-agreement accuracy via the flattened fast_iou_metric call
    :100, mean per-sample BCE loss).
  * score_model_best_iou (:20-64): predict all validation samples, sweep 31
    thresholds = logit(linspace(0.3, 0.7, 31)) — logit-space values against
    sigmoid outputs, a preserved reference quirk (:48-50) — and argmax the
    Kaggle batch IoU.

TPU-native design: zero-trace evaluation is embarrassingly parallel, so the
per-sample python loops become one vmapped/jitted chunked forward; the
threshold sweep is the fused device reduction ops.iou.threshold_sweep_jit
(the reference's slowest CPU loop, SURVEY.md §3.3).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from plastic_unet_tpu.ops.iou import threshold_sweep_jit
from plastic_unet_tpu.ops.losses import bce_probs


def _as_variables(params):
    """Serving entry points accept either a bare params tree or a full flax
    variables dict (e.g. {'params': ..., 'quant': ...} from
    submit.quant.quantize_for_serving). A top-level 'params' key marks the
    latter (no module in this family is named 'params')."""
    if isinstance(params, dict) and "params" in params:
        return params
    return {"params": params}


@functools.partial(jax.jit, static_argnums=(0,))
def _forward_chunk(model, params, x):
    """Zero-hebb forward on a (B, H, W, C) chunk -> activout (B, nbf, nbf)."""
    hebb = model.initial_zero_hebb(x.shape[0], dtype=x.dtype)
    out = model.apply(_as_variables(params), x, hebb, train=False)
    return out.activout


@functools.partial(jax.jit, static_argnums=(0,))
def _forward_all(model, params, Xc):
    """lax.map over pre-chunked (NC, B, H, W, C) input — the whole sweep is
    ONE device program (chunking only bounds peak memory)."""
    return jax.lax.map(lambda x: _forward_chunk(model, params, x), Xc)


def predict_masks(model, params, X, *, chunk: int = 128, mesh=None) -> jax.Array:
    """Predict sigmoid masks for X (N, H, W, C) with zero traces, chunked to
    bound device memory. Returns (N, nbf, nbf) on device.

    mesh: optional 1-D ('data',) `jax.sharding.Mesh` — shards each chunk's
    batch axis across devices (zero-trace inference is embarrassingly
    parallel, so this is pure batch partitioning: no collectives in the
    forward, results identical to single-device). chunk must divide evenly
    by mesh.size."""
    X = jnp.asarray(X)
    n = X.shape[0]
    pad = (-n) % chunk
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)], axis=0)
    nc = X.shape[0] // chunk
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if chunk % mesh.size:
            raise ValueError(f"chunk ({chunk}) must be divisible by mesh size ({mesh.size})")
        Xc = jax.device_put(
            X.reshape(nc, chunk, *X.shape[1:]),
            NamedSharding(mesh, PartitionSpec(None, mesh.axis_names[0])),
        )
        params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
        out = _forward_all(model, params, Xc)
        return out.reshape(nc * chunk, *out.shape[2:])[:n]
    if nc <= 1:
        return _forward_chunk(model, params, X)[:n]
    out = _forward_all(model, params, X.reshape(nc, chunk, *X.shape[1:]))
    return out.reshape(nc * chunk, *out.shape[2:])[:n]


@functools.partial(jax.jit, static_argnums=(0,))
def _eval_metrics(model, params, x, y):
    """(per-sample BCE losses, per-sample pixel accuracies) for one chunk."""
    hebb = model.initial_zero_hebb(x.shape[0], dtype=x.dtype)
    out = model.apply(_as_variables(params), x, hebb, train=False)
    pred = out.activout.reshape(x.shape[0], -1)
    tgt = y.reshape(x.shape[0], -1)
    losses = jax.vmap(bce_probs)(pred, tgt)
    accs = jnp.mean(((pred > 0.5) == (tgt > 0)).astype(jnp.float32), axis=1)
    return losses, accs


def eval_net(model, params, X_val, y_val, *, chunk: int = 128, debug: bool = False):
    """Validation pass. Returns (accuracy, loss) like reference eval_net.

    Accuracy is the reference's flattened fast_iou_metric (eval.py:100),
    which reduces to per-pixel agreement of (pred>0.5) vs (true>0) — see
    ops.iou docstring for the derivation.
    """
    X_val = jnp.asarray(X_val)
    y_val = jnp.asarray(y_val)
    n = X_val.shape[0]
    pad = (-n) % chunk
    if pad:
        X_val = jnp.concatenate([X_val, jnp.zeros((pad,) + X_val.shape[1:], X_val.dtype)], 0)
        y_val = jnp.concatenate([y_val, jnp.zeros((pad,) + y_val.shape[1:], y_val.dtype)], 0)
    losses, accs = [], []
    for i in range(0, X_val.shape[0], chunk):
        l, a = _eval_metrics(model, params, X_val[i : i + chunk], y_val[i : i + chunk])
        losses.append(l)
        accs.append(a)
    losses = jnp.concatenate(losses)[:n]
    accs = jnp.concatenate(accs)[:n]
    return float(jnp.mean(accs)), float(jnp.mean(losses))


def threshold_grid() -> np.ndarray:
    """The reference's 31 logit-space thresholds (eval.py:48-50)."""
    t = np.linspace(0.3, 0.7, 31)
    return np.log(t / (1 - t))


def score_model_best_iou(model, params, X_valid, y_valid, *, chunk: int = 128, debug: bool = False):
    """Best-threshold search on validation. Returns (threshold_best, iou_best)."""
    preds = predict_masks(model, params, X_valid, chunk=chunk)
    thresholds = jnp.asarray(threshold_grid(), dtype=preds.dtype)
    ious = np.asarray(threshold_sweep_jit(jnp.asarray(y_valid), preds, thresholds))
    if debug:
        print(ious)
    best = int(np.argmax(ious))
    return float(np.asarray(thresholds)[best]), float(ious[best])
