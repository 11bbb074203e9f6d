"""IoU metrics for TGS-Salt — vectorized numpy + device-side JAX versions.

Semantics match the reference src/utils/iou_metric.py exactly, but the
implementations are rewritten closed-form:

* ``iou_metric`` (reference :26-79) builds 2x2 histograms with
  ``np.histogram2d(bins=[0,.5,1])``, drops the background row/col, patches
  zeros with 1e-9, and runs an object-matching precision loop. With
  ``true_objects = pred_objects = 2`` that machinery degenerates to a single
  scalar comparison: with I = #{t>=.5 & p>=.5}, U = #{t>=.5} + #{p>=.5} - I
  (each replaced by 1e-9 when zero), precision(thr) = 1 if I/U > thr else 0,
  and the metric is the mean over thr in {0.50, 0.55, ..., 0.95}. We compute
  that form directly (verified against the reference in tests/test_iou.py).
  Note the both-empty case yields 1e-9/1e-9 = 1.0 -> metric 1, matching the
  reference's edge-case comment (iou_metric.py:33).

* ``get_iou_vector`` / ``fast_iou_metric`` (reference :6-24) threshold at
  >0 / >0.5 and mean `iou > thr` over the same 10 thresholds. The reference
  loops in Python over axis 0 — including the degenerate flattened-pixel call
  from eval.py:100 where each "batch element" is a scalar pixel; the
  vectorized reduction below reproduces both usages bit-for-bit.

* ``iou_metric_batch_jax`` fuses the full 31-threshold x N-image sweep of
  score_model_best_iou (reference eval.py:52, the CPU hot loop, §3.3) into
  one jitted device reduction.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Kaggle TGS precision thresholds 0.5:0.05:0.95 (reference iou_metric.py:67).
KAGGLE_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def iou_metric(y_true_in, y_pred_in, print_table: bool = False) -> float:
    """Kaggle TGS mean-precision-over-thresholds for a single mask pair."""
    t = np.asarray(y_true_in) >= 0.5
    p = np.asarray(y_pred_in) >= 0.5
    inter = float(np.count_nonzero(t & p))
    union = float(np.count_nonzero(t)) + float(np.count_nonzero(p)) - inter
    if inter == 0.0:
        inter = 1e-9
    if union == 0.0:
        union = 1e-9
    iou = inter / union
    prec = (iou > KAGGLE_THRESHOLDS).astype(np.float64)
    if print_table:
        print("Thresh\tTP\tFP\tFN\tPrec.")
        for thr, pr in zip(KAGGLE_THRESHOLDS, prec):
            tp = int(pr)
            print("{:1.3f}\t{}\t{}\t{}\t{:1.3f}".format(thr, tp, 1 - tp, 1 - tp, pr))
        print("AP\t-\t-\t-\t{:1.3f}".format(prec.mean()))
    return float(prec.mean())


def iou_metric_batch(y_true_in, y_pred_in) -> np.ndarray:
    """Mean of :func:`iou_metric` over the leading batch axis
    (reference iou_metric.py:81-87), vectorized."""
    t = np.asarray(y_true_in) >= 0.5
    p = np.asarray(y_pred_in) >= 0.5
    n = t.shape[0]
    t = t.reshape(n, -1)
    p = np.broadcast_to(p.reshape(p.shape[0], -1), t.shape) if p.shape[0] == n else p.reshape(n, -1)
    inter = (t & p).sum(axis=1).astype(np.float64)
    union = t.sum(axis=1) + p.sum(axis=1) - inter
    inter = np.where(inter == 0, 1e-9, inter)
    union = np.where(union == 0, 1e-9, union)
    iou = inter / union  # (n,)
    prec = (iou[:, None] > KAGGLE_THRESHOLDS[None, :]).mean(axis=1)
    return np.array(prec.mean(), dtype=np.float32)


def get_iou_vector(A, B) -> float:
    """Binary-IoU-vs-thresholds metric (reference iou_metric.py:6-20).

    Reduces each element along axis 0 over all remaining axes; for 1-D
    inputs each element is a scalar pixel (the eval.py:100 flattened call),
    reproducing the reference's per-pixel-agreement semantics.
    """
    t = np.asarray(A) > 0
    p = np.asarray(B) > 0
    n = t.shape[0]
    t = t.reshape(n, -1)
    p = p.reshape(n, -1)
    inter = np.logical_and(t, p).sum(axis=1).astype(np.float64)
    union = np.logical_or(t, p).sum(axis=1).astype(np.float64)
    iou = (inter + 1e-10) / (union + 1e-10)
    metric = (iou[:, None] > KAGGLE_THRESHOLDS[None, :]).mean(axis=1)
    return float(metric.mean())


def fast_iou_metric(y_true_in, y_pred_in) -> float:
    """Training-time validation accuracy (reference iou_metric.py:22-24)."""
    return get_iou_vector(y_true_in, np.asarray(y_pred_in) > 0.5)


# ---------------------------------------------------------------------------
# Device-side (JAX) versions — used by the batched eval/threshold-search path.
# ---------------------------------------------------------------------------

_KT = jnp.asarray(KAGGLE_THRESHOLDS)


def iou_metric_batch_jit(y_true: jax.Array, y_pred_bool: jax.Array) -> jax.Array:
    """JAX twin of :func:`iou_metric_batch`: (N, ...) masks -> scalar f32."""
    n = y_true.shape[0]
    t = (y_true >= 0.5).reshape(n, -1)
    p = y_pred_bool.reshape(n, -1).astype(bool)
    inter = jnp.sum(t & p, axis=1).astype(jnp.float32)
    union = jnp.sum(t, axis=1) + jnp.sum(p, axis=1) - inter
    inter = jnp.where(inter == 0, 1e-9, inter)
    union = jnp.where(union == 0, 1e-9, union)
    iou = inter / union
    prec = jnp.mean(iou[:, None] > _KT[None, :], axis=1)
    return jnp.mean(prec).astype(jnp.float32)


def threshold_sweep_jit(y_true: jax.Array, preds: jax.Array, thresholds: jax.Array) -> jax.Array:
    """Fused threshold sweep: IoU-batch metric for every threshold.

    Replaces the reference's CPU hot loop (eval.py:52: 31 thresholds x N
    images x histogram2d) with one device reduction. Returns (T,) metrics.

    y_true: (N, ...) ground-truth masks. preds: (N, ...) raw predictions
    (compared with `preds > thr`, matching eval.py:52 where thresholds are
    logit-space values swept against sigmoid outputs — a preserved reference
    quirk, see eval.py:48-50).
    """
    n = y_true.shape[0]
    t = (y_true >= 0.5).reshape(n, -1)
    pv = preds.reshape(n, -1)
    t_sum = jnp.sum(t, axis=1).astype(jnp.float32)  # (N,)

    def per_thr(thr):
        p = pv > thr
        inter = jnp.sum(t & p, axis=1).astype(jnp.float32)
        union = t_sum + jnp.sum(p, axis=1) - inter
        inter = jnp.where(inter == 0, 1e-9, inter)
        union = jnp.where(union == 0, 1e-9, union)
        iou = inter / union
        return jnp.mean(jnp.mean(iou[:, None] > _KT[None, :], axis=1))

    return jax.lax.map(per_thr, thresholds).astype(jnp.float32)


def pixel_accuracy_jit(y_true_flat: jax.Array, y_pred_flat: jax.Array) -> jax.Array:
    """Device twin of the eval.py:100 flattened fast_iou_metric call, which
    degenerates to per-pixel agreement of (pred > 0.5) vs (true > 0)."""
    return jnp.mean(((y_pred_flat > 0.5) == (y_true_flat > 0)).astype(jnp.float32))
