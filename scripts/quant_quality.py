#!/usr/bin/env python3
"""int8 serving quantization quality study (companion to scripts/r4_quant_probe.py).

Protocol: train the flagship UNetPRes on the synthetic TGS-like dataset with
the showdown protocol (scripts/quality_showdown.py — tuned config at
neurons=8, reference-exact loop), then score the SAME trained params with the
REFERENCE's own evaluation semantics (/root/reference/src/eval.py:20-64 —
zero-trace forwards, 31 logit-space thresholds, iou_metric_batch argmax)
three ways:

  * fp32 serving (the parity path),
  * int8 serving calibrated on TRAIN images (deployment-honest: calibration
    never sees the eval set),
  * int8 serving with the fp32-searched threshold (what a user gets if they
    quantize AFTER the threshold search — the cheaper, slightly-less-correct
    deployment recipe).

Writes results/quant_quality.json. CPU-runnable (PLASTIC_UNET_PLATFORM=cpu);
env knobs: QQ_EPOCHS, QQ_TRAIN, QQ_VAL, QQ_SEED, QQ_RULE, QQ_OUT.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.quant import quantize_for_serving
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils.precision import matmul_precision

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from quality_showdown import DROPOUT, GAMMA, LR, NBF, STEPLR, ref_score

    epochs = int(os.environ.get("QQ_EPOCHS", 12))
    n_train = int(os.environ.get("QQ_TRAIN", 256))
    n_val = int(os.environ.get("QQ_VAL", 64))
    seed = int(os.environ.get("QQ_SEED", 77))
    rule = os.environ.get("QQ_RULE", "hebb")
    neurons = 8  # tuned config (unet_p_res_script.py:30)

    with matmul_precision("parity"):
        x_train, x_val, y_train, y_val = synthetic_split(n_train, n_val, size=NBF, seed=seed)
        model = UNetPRes(n_channels=1, n_classes=1, neurons=neurons, dropout_ratio=DROPOUT,
                         nbf=NBF, rule=rule)
        tx = adam_step_lr(LR, GAMMA, STEPLR)
        state = create_train_state(model, tx, jax.random.PRNGKey(seed), (NBF, NBF, 1))
        epoch_fn = make_epoch_fn(model, tx, loss_space="probs", donate=False)
        X = jnp.asarray(np.transpose(x_train.astype(np.float32), (0, 2, 3, 1)))[:, None]
        Y = jnp.asarray(y_train.astype(np.float32)[:, 0][:, None])
        rng = jax.random.PRNGKey(seed + 1)
        t0 = time.time()
        for epoch in range(epochs):
            state = state._replace(hebb=jnp.zeros_like(state.hebb))
            state, losses = epoch_fn(state, X, Y, jax.random.fold_in(rng, epoch))
            print(f"epoch {epoch + 1}/{epochs} loss={float(np.mean(np.asarray(losses))):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        params = state.params

        Xv = jnp.asarray(np.transpose(x_val.astype(np.float32), (0, 2, 3, 1)))
        Xtr_nhwc = jnp.asarray(np.transpose(x_train.astype(np.float32), (0, 2, 3, 1)))
        yv = y_val.squeeze(1)

        @jax.jit
        def fwd32(p, x):
            out = model.apply({"params": p}, x, model.initial_zero_hebb(x.shape[0]), train=False)
            return out.activout

        preds32 = np.asarray(fwd32(params, Xv))
        iou32, thr32, _ = ref_score(preds32, yv)

        # deployment-honest calibration: train images only
        qmodel, qvars = quantize_for_serving(model, params, Xtr_nhwc[:256])

        @jax.jit
        def fwd8(v, x):
            out = qmodel.apply(v, x, qmodel.initial_zero_hebb(x.shape[0]), train=False)
            return out.activout

        preds8 = np.asarray(fwd8(qvars, Xv))
        iou8, thr8, _ = ref_score(preds8, yv)

    # int8 masks cut at the fp32-searched threshold (quantize-after-search),
    # scored with the reference's iou_metric_batch. NOTE: reference thresholds
    # are logit-space values compared against sigmoid outputs directly (the
    # preserved quirk, eval.py:48-52) — replicate exactly.
    from quality_showdown import _import_ref

    iou_mod = _import_ref("utils.iou_metric")
    masks8_at32 = (preds8 > thr32).astype(np.float64)
    iou8_at_thr32 = float(iou_mod.iou_metric_batch(yv, masks8_at32))

    d = np.abs(preds8 - preds32)
    result = {
        "protocol": {"epochs": epochs, "train": n_train, "val": n_val, "seed": seed,
                     "rule": rule, "neurons": neurons,
                     "calibration": "first 256 train images (never the eval set)"},
        "fp32": {"best_iou": iou32, "best_threshold": thr32},
        "int8": {"best_iou": iou8, "best_threshold": thr8},
        "int8_at_fp32_threshold_iou": iou8_at_thr32,
        "iou_delta_best": iou8 - iou32,
        "sigmoid_diff": {"max": float(d.max()), "mean": float(d.mean())},
        "mask_agreement_at_own_thresholds": float(
            np.mean((preds8 > thr8) == (preds32 > thr32))
        ),
        "device": str(jax.devices()[0]),
    }
    os.makedirs("results", exist_ok=True)
    with open(os.environ.get("QQ_OUT", "results/quant_quality.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
