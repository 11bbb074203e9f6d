"""int8 serving quantization: calibration + serving-variable packaging.

A serving EXTENSION above the reference's fp32 inference (src/infer.py:28-48)
and this framework's bf16 serving graphs: post-training quantization of the
conv trunk to int8 (2x MXU rate on TPU v5e). See ops/quant.py for the
numerics and models/blocks.py QuantConv3/QuantConvT3 for the modules.

Usage:
    qmodel, variables = quantize_for_serving(model, params, X_calib)
    preds = predict_masks(qmodel, variables, X_test)          # eval.evaluate
    preds = predict_masks_tta(qmodel, variables, X_test, ...) # submit.inference

`variables` is the flax dict {'params': <unchanged fp32 params>,
'quant': <per-conv activation ranges>}; every serving entry point accepts it
wherever a bare params tree is accepted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=0)
def _calib_first(model, params, x):
    """First calibration chunk: creates the 'quant' collection."""
    hebb = model.initial_zero_hebb(x.shape[0], dtype=x.dtype)
    _, mut = model.apply({"params": params}, x, hebb, train=False, mutable=["quant"])
    return mut["quant"]


@functools.partial(jax.jit, static_argnums=0)
def _calib_step(model, params, quant, x):
    """Subsequent chunks: running max over the existing collection."""
    hebb = model.initial_zero_hebb(x.shape[0], dtype=x.dtype)
    _, mut = model.apply({"params": params, "quant": quant}, x, hebb, train=False, mutable=["quant"])
    return mut["quant"]


def calibrate(model, params, X_calib, *, chunk: int = 128):
    """Run the model in 'calib' mode over X_calib (N, H, W, C) and return the
    'quant' collection: one scalar amax (= max |input| observed) per
    quantized conv. The forward math in calib mode is the plain fp32/bf16
    conv path, so calibration observes exactly the serving distribution.

    Chunks are NOT zero-padded (unlike predict_masks): padded all-zero
    samples would push bias-dominated activations through the net and
    pollute the ranges of the deeper convs. A ragged tail chunk just
    compiles one extra specialization."""
    cmodel = model.clone(quant="calib")
    X = jnp.asarray(X_calib)
    if X.shape[0] == 0:
        raise ValueError("calibration set is empty")
    quant = None
    for i in range(0, X.shape[0], chunk):
        x = X[i : i + chunk]
        quant = _calib_first(cmodel, params, x) if quant is None else _calib_step(cmodel, params, quant, x)
    return quant


def quantize_for_serving(model, params, X_calib, *, chunk: int = 128):
    """Calibrate and package: returns (int8-serving model, variables dict)
    ready for eval.predict_masks / submit.predict_masks_tta / submit.predict.
    `params` is unchanged (weights quantize on the fly per forward — cheap:
    the whole param tree is ~0.5 MB — so the same checkpoint serves fp32,
    bf16 and int8)."""
    quant = calibrate(model, params, X_calib, chunk=chunk)
    return model.clone(quant="int8"), {"params": params, "quant": quant}
