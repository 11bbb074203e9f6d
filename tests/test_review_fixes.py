"""Regression tests for the round-3 self-review findings: memoization must
key on the patch_conv experiment knobs, device-side binarization must match
the host float64 compare for arbitrary --fixed-threshold values, bad CLI
specs must fail fast, and unsupported knob/arch combinations must be
rejected instead of silently ignored."""

import numpy as np
import pytest

from plastic_unet_tpu.config import TrainConfig


def test_threshold_as_f32_matches_f64_compare():
    """For every f32 prediction p and any f64 threshold t, the device-side
    f32 compare p > threshold_as_f32(t) must equal the host compare p > t
    (the old straight f32 cast misclassified p == f32(0.3))."""
    from plastic_unet_tpu.submit.inference import threshold_as_f32

    rng = np.random.default_rng(0)
    for t in [0.3, 0.5, 0.7, 0.30000001, 0.6999999, float(np.float32(0.4321))]:
        t32 = threshold_as_f32(t)
        assert float(t32) <= t
        # dense probe around the threshold plus random picks
        base = np.float32(t)
        near = [base]
        for _ in range(6):
            near.append(np.nextafter(near[-1], np.float32(0.0)))
        for _ in range(6):
            near.append(np.nextafter(near[0], np.float32(1.0)))
        preds = np.concatenate(
            [np.float32(near), rng.random(100, dtype=np.float32)]
        )
        np.testing.assert_array_equal(
            preds > t32, preds.astype(np.float64) > t,
            err_msg=f"threshold {t!r}",
        )

    # the exact motivating case: p == f32(0.3) was 1 under the reference's
    # host f64 compare, 0 under a straight f32 cast
    p = np.float32(0.3)
    assert bool(p > threshold_as_f32(0.3)) is bool(float(p) > 0.3) is True


def test_parse_tta_rejects_empty_spec():
    from plastic_unet_tpu.ops.augment import parse_tta

    for bad in ["", " ", ",", " , "]:
        with pytest.raises(ValueError, match="empty TTA spec"):
            parse_tta(bad)


def test_build_model_rejects_unet_trunk_knobs():
    """arch='unet' supports none of the unet_res trunk-surgery knobs; they
    must error, not silently drop (e.g. --trunk-pad is documented as 'must
    match how the model was trained')."""
    from plastic_unet_tpu.train.driver import build_model

    base = dict(out_dir="/tmp/x", arch="unet", im_width=16, im_height=16)
    for kw in [
        {"trunk_pad": 32},
        {"patch_conv": 32},
        {"pallas_trunk": True},
        {"fast_dw": True},
        {"compute_dtype": "bfloat16"},
    ]:
        with pytest.raises(ValueError, match="unet"):
            build_model(TrainConfig(**base, **kw))
    build_model(TrainConfig(**base))  # defaults stay fine


def test_trunk_pad_nonsquare_rejected():
    """pad_to/crop_from restore a square geometry; a non-square input under
    trunk_pad must raise instead of silently mis-cropping the width (the old
    code also skipped padding entirely when h0 == trunk_pad > w0)."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.models.unet_res import UNetPRes

    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, nbf=16, trunk_pad=32)
    x = jnp.zeros((1, 32, 16, 1))  # h0 == trunk_pad, w0 < trunk_pad
    hebb = model.initial_zero_hebb()
    with pytest.raises(ValueError, match="square"):
        model.init(jax.random.PRNGKey(0), x, hebb)


def test_epoch_fn_cache_keys_on_patch_conv_gates():
    """Flipping a patch_conv experiment knob then rebuilding an epoch fn
    must NOT return the executable traced under the old knob values (the
    gate-sweep-probe staleness hazard)."""
    from plastic_unet_tpu.models.unet_res import UNetPRes
    from plastic_unet_tpu.ops import patch_conv
    from plastic_unet_tpu.train.loop import make_epoch_fn
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, neurons=2, nbf=16, patch_conv=32)
    tx = adam_step_lr(3e-4, 0.666, 1e5)

    f1 = make_epoch_fn(model, tx)
    assert make_epoch_fn(model, tx) is f1  # same gates -> memoized

    orig = patch_conv.TAP_WIDE
    try:
        patch_conv.TAP_WIDE = not orig
        f2 = make_epoch_fn(model, tx)
        assert f2 is not f1  # knob flip -> fresh build
    finally:
        patch_conv.TAP_WIDE = orig
    assert make_epoch_fn(model, tx) is f1  # restored -> memoized again


def test_backend_is_cpu_does_not_initialize_backend(monkeypatch):
    """enable_compilation_cache's platform check must stay config-only: it
    reads jax_platforms / PLASTIC_UNET_PLATFORM instead of calling
    jax.default_backend() (which would lock in the default backend — and in
    production claim the single-client TPU relay — before callers can force
    CPU)."""
    import jax

    from plastic_unet_tpu.utils.compilation_cache import _backend_is_cpu

    # Under the test conftest jax_platforms is forced to "cpu".
    assert _backend_is_cpu() is True

    # Must never consult default_backend() when the config answers.
    def _boom():
        raise AssertionError("default_backend() initializes a backend")

    monkeypatch.setattr(jax, "default_backend", _boom)
    assert _backend_is_cpu() is True
