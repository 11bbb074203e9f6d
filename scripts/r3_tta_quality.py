#!/usr/bin/env python3
"""Quality evidence for the TTA extension (round 3): train the tuned config
for a few epochs on the showdown protocol's synthetic data, then score the
SAME trained weights with the reference's own best-IoU evaluation
(scripts/quality_showdown.py::ref_score semantics) under 1 / 2 / 4 / 8 TTA
views. The reference has no TTA at all (SURVEY.md §6), so any lift is pure
capability-extension value; at few-epoch checkpoints the masks are noisy
enough for ensembling to matter.

Writes results/tta_quality.json and prints one JSON line per view set.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LR, GAMMA, STEPLR = 3e-4, 0.666, 1e4
NEURONS, NBF, DROPOUT = 8, 101, 0.5


def ref_score(preds, y_val):
    """Reference score_model_best_iou semantics (eval.py:20-64) via the
    showdown helper (imports the reference's own iou_metric_batch)."""
    from scripts.quality_showdown import ref_score as rs

    return rs(preds, y_val)


def main():
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_split
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_2, TTA_VIEWS_4, TTA_VIEWS_8
    from plastic_unet_tpu.submit.inference import predict_masks_tta
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils import enable_compilation_cache
    from plastic_unet_tpu.utils.precision import matmul_precision

    enable_compilation_cache()
    epochs = int(os.environ.get("TTA_Q_EPOCHS", 12))
    n_train, n_val, seed = 256, 64, 77  # the committed showdown protocol

    with matmul_precision("parity"):
        x_train, x_val, y_train, y_val = synthetic_split(n_train, n_val, size=NBF, seed=seed)
        model = UNetPRes(n_channels=1, n_classes=1, neurons=NEURONS, dropout_ratio=DROPOUT,
                         nbf=NBF, rule="hebb")
        tx = adam_step_lr(LR, GAMMA, STEPLR)
        state = create_train_state(model, tx, jax.random.PRNGKey(seed), (NBF, NBF, 1))
        epoch_fn = make_epoch_fn(model, tx, loss_space="probs", donate=False)
        X = jnp.asarray(np.transpose(x_train.astype(np.float32), (0, 2, 3, 1)))[:, None]
        Y = jnp.asarray(y_train.astype(np.float32)[:, 0][:, None])
        rng = jax.random.PRNGKey(seed + 1)
        for epoch in range(epochs):
            state = state._replace(hebb=jnp.zeros_like(state.hebb))
            state, losses = epoch_fn(state, X, Y, jax.random.fold_in(rng, epoch))
        np.asarray(losses)  # sync

        Xv = jnp.asarray(np.transpose(x_val.astype(np.float32), (0, 2, 3, 1)))
        out = {"epochs": epochs, "protocol": "showdown(seed77,256/64)"}
        for name, views in (
            ("tta1", ("identity",)),
            ("tta2", TTA_VIEWS_2),
            ("tta4", TTA_VIEWS_4),
            ("tta8", TTA_VIEWS_8),
        ):
            preds = np.asarray(predict_masks_tta(model, state.params, Xv, transforms=views))
            best_iou, best_thr, _ = ref_score(preds, y_val.squeeze(1))
            out[name] = {"best_iou": round(best_iou, 4), "best_threshold": round(best_thr, 4)}
            print(json.dumps({name: out[name]}), flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/tta_quality.json", "w") as f:
        json.dump(out, f, indent=1)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
