"""Golden tests for IoU metrics vs the reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from plastic_unet_tpu.ops import (
    fast_iou_metric,
    get_iou_vector,
    iou_metric,
    iou_metric_batch,
    iou_metric_batch_jit,
    pixel_accuracy_jit,
    threshold_sweep_jit,
)

from conftest import has_reference, import_reference_module


def _mask_pairs(rng):
    z = np.zeros((101, 101))
    o = np.ones((101, 101))
    yield z, z.copy()  # both empty -> 1.0 (reference edge case, iou_metric.py:33)
    yield o, o.copy()
    yield z, o.copy()
    yield o, z.copy()
    for _ in range(6):
        t = (rng.random((101, 101)) > 0.6).astype(np.float64)
        p = (rng.random((101, 101)) > 0.6).astype(np.float64)
        yield t, p
    # Near-identical pair (high IoU, exercises threshold granularity)
    t = (rng.random((101, 101)) > 0.4).astype(np.float64)
    p = t.copy()
    p[:3, :3] = 1 - p[:3, :3]
    yield t, p


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
def test_iou_metric_matches_reference(rng):
    ref = import_reference_module("utils.iou_metric")
    for t, p in _mask_pairs(rng):
        assert iou_metric(t, p) == pytest.approx(ref.iou_metric(t, p), abs=1e-12)


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
def test_iou_metric_batch_matches_reference(rng):
    ref = import_reference_module("utils.iou_metric")
    t = (rng.random((8, 1, 101, 101)) > 0.6).astype(np.float64)
    p = (rng.random((8, 101, 101)) > 0.6)
    assert iou_metric_batch(t, p) == pytest.approx(float(ref.iou_metric_batch(t, p)), abs=1e-7)


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
def test_get_iou_vector_matches_reference(rng):
    ref = import_reference_module("utils.iou_metric")
    # Batched 2-D usage
    A = (rng.random((6, 101, 101)) > 0.5).astype(np.float64)
    B = (rng.random((6, 101, 101)) > 0.5).astype(np.float64)
    assert get_iou_vector(A, B) == pytest.approx(ref.get_iou_vector(A, B), abs=1e-12)
    # Flattened per-pixel usage (eval.py:100 quirk): each element is a scalar
    a = rng.random(500)
    b = rng.random(500)
    assert fast_iou_metric(a, b) == pytest.approx(ref.fast_iou_metric(a, b), abs=1e-12)


def test_fast_iou_is_pixel_accuracy(rng):
    a = rng.random(1000)
    b = rng.random(1000)
    expected = np.mean((b > 0.5) == (a > 0))
    assert fast_iou_metric(a, b) == pytest.approx(expected, abs=1e-12)
    assert float(pixel_accuracy_jit(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(expected, abs=1e-6)


def test_jit_batch_matches_numpy(rng):
    t = (rng.random((8, 1, 101, 101)) > 0.6).astype(np.float32)
    p = rng.random((8, 101, 101)).astype(np.float32) > 0.5
    got = float(iou_metric_batch_jit(jnp.asarray(t), jnp.asarray(p)))
    assert got == pytest.approx(float(iou_metric_batch(t, p)), abs=1e-6)


def test_threshold_sweep_matches_loop(rng):
    """The fused device sweep must match the reference's python loop over
    iou_metric_batch with logit-space thresholds (eval.py:48-52)."""
    y = (rng.random((10, 1, 101, 101)) > 0.6).astype(np.float32)
    preds = rng.random((10, 101, 101)).astype(np.float32)  # sigmoid outputs
    thresholds_ori = np.linspace(0.3, 0.7, 31)
    thresholds = np.log(thresholds_ori / (1 - thresholds_ori))
    expected = np.array([iou_metric_batch(y, preds > thr) for thr in thresholds])
    got = np.asarray(threshold_sweep_jit(jnp.asarray(y), jnp.asarray(preds), jnp.asarray(thresholds)))
    np.testing.assert_allclose(got, expected, atol=1e-6)
