"""int8 serving quantization (ops/quant.py, submit/quant.py, QuantConv3/T3).

A serving EXTENSION above the reference's fp32 inference (src/infer.py:28-48):
the conv trunk runs as int8 convs with int32 accumulation (2x MXU rate on
TPU v5e). These tests pin: the int8 integer math is exact, calibration
collects true activation ranges, the param tree is unchanged (fp32
checkpoints serve int8 directly), the quantized forward tracks fp32 closely,
and the serving entry points (chunked, TTA, data-mesh) accept the quantized
variables dict.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.eval.evaluate import predict_masks
from plastic_unet_tpu.models.unet_res import UNetPRes
from plastic_unet_tpu.ops.quant import qconv3_same, quantize_act, quantize_weight
from plastic_unet_tpu.submit.inference import predict_masks_tta
from plastic_unet_tpu.submit.quant import calibrate, quantize_for_serving

SIZE = 32
N_QUANT_CONVS = 49  # 4 downs x 5 convs + middle x 5 + 4 ups x (convT + 5)


@pytest.fixture(scope="module")
def model_params():
    model = UNetPRes(nbf=SIZE, neurons=2)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1))
    return model, vs["params"]


@pytest.fixture(scope="module")
def calib_data():
    return jnp.asarray(np.random.default_rng(7).random((12, SIZE, SIZE, 1), dtype=np.float32))


def test_qconv3_integer_exact(rng):
    """On inputs/weights that are exactly representable post-quantization,
    the int8 conv (int32 accumulation + dequant) equals the fp32 conv
    bit-for-bit — the integer path is exact, not approximate."""
    amax = jnp.float32(127.0)  # scale 1.0: integers in [-127, 127] are exact
    x = jnp.asarray(rng.integers(-127, 128, (2, 9, 9, 4)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 128, (3, 3, 4, 8)), jnp.float32)
    # pin each output channel's |max| to 127 so the per-channel scale is
    # exactly 1 and every integer weight sits on the quantization grid
    k = k.at[0, 0, 0, :].set(127.0)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    got = qconv3_same(x, k, b, amax)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn) + b
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_act_saturates():
    x = jnp.asarray([-10.0, -1.0, 0.0, 1.0, 10.0])
    q, scale = quantize_act(x, jnp.float32(1.0))
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [-127, -127, 0, 127, 127])
    assert float(scale) == pytest.approx(1.0 / 127.0)


def test_quantize_weight_zero_channel():
    """All-zero output channels quantize exactly (scale 0, no NaN/inf)."""
    k = jnp.zeros((3, 3, 2, 4)).at[..., 0].set(1.0)
    q, s = quantize_weight(k, cout_axis=3)
    assert np.isfinite(np.asarray(s)).all()
    np.testing.assert_array_equal(np.asarray(s)[1:], 0.0)
    np.testing.assert_array_equal(np.asarray(q)[..., 1:], 0)
    np.testing.assert_array_equal(np.asarray(q)[..., 0], 127)


def test_calibration_collects_global_max(model_params, calib_data):
    """One amax per quantized conv; the stem conv's range is exactly
    max|X| over ALL chunks (running max across chunk boundaries)."""
    model, params = model_params
    quant = calibrate(model, params, calib_data, chunk=5)  # ragged tail chunk
    leaves = jax.tree_util.tree_leaves(quant)
    assert len(leaves) == N_QUANT_CONVS
    stem = quant["DownRes_0"]["Conv_0"]["amax"]
    assert float(stem) == pytest.approx(float(jnp.max(jnp.abs(calib_data))), rel=0, abs=0)


def test_param_tree_unchanged(model_params):
    """The int8/calib model declares the exact same params (paths, shapes,
    values under the same init RNG) as the plain model — checkpoints are
    interchangeable."""
    model, params = model_params
    qvs = model.clone(quant="calib").init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1)
    )
    assert jax.tree_util.tree_structure(qvs["params"]) == jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(qvs["params"]), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_forward_tracks_fp32(model_params, calib_data):
    model, params = model_params
    want = np.asarray(predict_masks(model, params, calib_data, chunk=8))
    qmodel, variables = quantize_for_serving(model, params, calib_data[:8], chunk=8)
    got = np.asarray(predict_masks(qmodel, variables, calib_data, chunk=8))
    assert got.shape == want.shape
    d = np.abs(got - want)
    # random-init net, measured max ~5e-5; x100 slack for platform variation
    assert d.max() < 5e-3, d.max()
    assert np.mean((got > 0.5) == (want > 0.5)) > 0.99


def test_tta_serving_path(model_params, calib_data):
    """predict_masks_tta accepts the quantized variables dict (the serving
    convention: a top-level 'params' key marks a full variables dict)."""
    model, params = model_params
    qmodel, variables = quantize_for_serving(model, params, calib_data[:8])
    want = np.asarray(predict_masks_tta(model, params, calib_data, transforms=("identity", "hflip"), chunk=8))
    got = np.asarray(predict_masks_tta(qmodel, variables, calib_data, transforms=("identity", "hflip"), chunk=8))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 5e-3


def test_mesh_serving_exact(model_params, calib_data):
    """int8 serving over an 8-device data mesh equals single-device int8
    exactly (pure batch partitioning; integer math is order-independent)."""
    from plastic_unet_tpu.parallel import make_mesh

    model, params = model_params
    qmodel, variables = quantize_for_serving(model, params, calib_data[:8])
    single = np.asarray(predict_masks(qmodel, variables, calib_data, chunk=8))
    sharded = np.asarray(predict_masks(qmodel, variables, calib_data, chunk=8, mesh=make_mesh(8)))
    np.testing.assert_array_equal(sharded, single)


def test_bf16_dequant_compose(model_params, calib_data):
    """quant='int8' composes with compute_dtype=bfloat16 (dequant output in
    bf16 — halves the elementwise/HBM cost between convs)."""
    model, params = model_params
    bmodel = model.clone(compute_dtype=jnp.bfloat16)
    qmodel, variables = quantize_for_serving(bmodel, params, calib_data[:8])
    got = np.asarray(predict_masks(qmodel, variables, calib_data, chunk=8))
    want = np.asarray(predict_masks(model, params, calib_data, chunk=8))
    assert np.abs(got - want).max() < 0.05  # bf16-rounded elementwise path


def test_int8_export_artifact_roundtrip(model_params, calib_data, tmp_path):
    """The int8 serving graph exports to a StableHLO artifact (int8 convs and
    calibrated scales baked in) and reloads bit-exact vs the live quantized
    forward — the deployment path carries the quantization win."""
    from plastic_unet_tpu.submit.export import export_predictor, load_predictor

    model, params = model_params
    qmodel, variables = quantize_for_serving(model, params, calib_data[:8])
    path = export_predictor(qmodel, variables, str(tmp_path / "art_int8"), chunk=4)
    pred = load_predictor(path).warmup()
    X = np.asarray(calib_data[:7], dtype=np.float32)
    got = pred.predict(X)
    want = np.asarray(predict_masks(qmodel, variables, X, chunk=4))
    np.testing.assert_array_equal(got, want)


def test_rejects_incompatible_knobs(model_params):
    model, params = model_params
    x = jnp.zeros((1, SIZE, SIZE, 1))
    for bad in (
        model.clone(quant="int8", fold_hires=True),
        model.clone(quant="int8", patch_conv=32),
        model.clone(quant="int8", remat_trunk=True),
        model.clone(quant="nonsense"),
    ):
        with pytest.raises(ValueError):
            bad.apply({"params": params}, x, bad.initial_zero_hebb(1), train=False)


def test_int8_without_calibration_fails(model_params):
    """Applying the int8 model without the 'quant' collection is an error
    (flax refuses to create variables in an immutable apply), not a silent
    wrong answer."""
    model, params = model_params
    qmodel = model.clone(quant="int8")
    x = jnp.zeros((1, SIZE, SIZE, 1))
    with pytest.raises(Exception):
        qmodel.apply({"params": params}, x, qmodel.initial_zero_hebb(1), train=False)
