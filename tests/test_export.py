"""Deployment artifacts (jax.export): round-trip exactness, in-graph TTA,
baked thresholds, CLI, and serving from an artifact.

The reference ships inference as a source-tree script (src/infer.py); the
rebuild's deployment story is a serialized StableHLO artifact
(submit/export.py). These tests pin that an exported-then-reloaded module is
the serving forward — bit-equal on the plain path; 1-ULP on the fused TTA
graph (recompilation from serialized StableHLO may fuse differently).
"""

import io
import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.submit.export import export_predictor, load_predictor
from plastic_unet_tpu.submit.inference import predict_masks_tta, threshold_as_f32

SIZE = 32


@pytest.fixture(scope="module")
def model_params():
    model = UNetPRes(nbf=SIZE, neurons=2)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1))
    return model, vs["params"]


def test_roundtrip_exact(model_params, tmp_path, rng):
    """Export -> serialize -> deserialize -> predict is bit-equal to the live
    serving forward, including partial-chunk padding (N=7, chunk=4)."""
    model, params = model_params
    path = export_predictor(model, params, str(tmp_path / "art"), chunk=4)
    pred = load_predictor(path).warmup()
    X = rng.standard_normal((7, SIZE, SIZE, 1)).astype(np.float32)
    got = pred.predict(X)
    want = np.asarray(predict_masks_tta(model, params, X, chunk=4))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_tta_artifact_exact(model_params, tmp_path, rng):
    """In-graph dihedral TTA (incl. a transpose view) equals the live
    sequential TTA path to 1 ULP.

    Not bit-exact by design: the artifact round-trips through serialized
    StableHLO and is recompiled at load, and XLA's fusion choices for the
    view-concat graph differ slightly from the live trace (measured max
    deviation 6e-8 under parity precision; the plain forward IS bit-exact —
    test_roundtrip_exact)."""
    model, params = model_params
    views = ("identity", "hflip", "rot90", "transpose")
    path = export_predictor(model, params, str(tmp_path / "art"), chunk=4, tta=views)
    X = rng.standard_normal((5, SIZE, SIZE, 1)).astype(np.float32)
    got = load_predictor(path).predict(X)
    want = np.asarray(predict_masks_tta(model, params, X, transforms=views, chunk=4))
    np.testing.assert_allclose(got, want, atol=1.2e-7)


def test_threshold_artifact(model_params, tmp_path, rng):
    """A baked threshold emits uint8 masks classified f64-exactly (0.3 is the
    adversarial case: its round-nearest f32 lies ABOVE the f64 value)."""
    model, params = model_params
    path = export_predictor(model, params, str(tmp_path / "art"), chunk=4, threshold=0.3)
    X = rng.standard_normal((4, SIZE, SIZE, 1)).astype(np.float32)
    got = load_predictor(path).predict(X)
    probs = np.asarray(predict_masks_tta(model, params, X, chunk=4))
    want = (probs > threshold_as_f32(0.3)).astype(np.uint8)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_predict_rle_paths(model_params, tmp_path, rng):
    """RLE encoding works from both thresholded and probability artifacts and
    matches the live MaskPredictor strings."""
    from plastic_unet_tpu.submit.server import MaskPredictor

    model, params = model_params
    X = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    want = MaskPredictor(model, params, chunk=4, threshold=0.5).predict_rle(X)

    thr_art = load_predictor(export_predictor(model, params, str(tmp_path / "a1"), chunk=4, threshold=0.5))
    assert thr_art.predict_rle(X) == want
    prob_art = load_predictor(export_predictor(model, params, str(tmp_path / "a2"), chunk=4))
    assert prob_art.predict_rle(X, threshold=0.5) == want
    with pytest.raises(ValueError, match="requires a threshold"):
        prob_art.predict_rle(X)


def test_artifact_validation(model_params, tmp_path, rng):
    model, params = model_params
    with pytest.raises(ValueError, match="unknown TTA"):
        export_predictor(model, params, str(tmp_path / "bad"), tta=("identity", "nope"))
    path = export_predictor(model, params, str(tmp_path / "art"), chunk=4)
    pred = load_predictor(path)
    with pytest.raises(ValueError, match="expected"):
        pred.predict(rng.standard_normal((2, SIZE + 1, SIZE)).astype(np.float32))
    meta_file = tmp_path / "art" / "meta.json"
    meta = json.loads(meta_file.read_text())
    meta["format_version"] = 99
    meta_file.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format_version"):
        load_predictor(path)


def test_cli_export(model_params, tmp_path, rng):
    """plastic-unet-export: .pth in, artifact out, predictions equal live."""
    pytest.importorskip("torch")
    from plastic_unet_tpu.cli.export_model import main
    from plastic_unet_tpu.utils.torch_interop import (
        flax_params_to_state_dict,
        save_pth,
        unetp_res_name_map,
    )

    model, params = model_params
    pth = str(tmp_path / "m.pth")
    save_pth(flax_params_to_state_dict(params, unetp_res_name_map()), pth)
    out = str(tmp_path / "artifact")
    main(["--model", pth, "--out", out, "--nbf", str(SIZE), "--neurons", "2",
          "--chunk", "4", "--tta", "tta2", "--platforms", "cpu"])
    X = rng.standard_normal((2, SIZE, SIZE, 1)).astype(np.float32)
    got = load_predictor(out).predict(X)
    want = np.asarray(predict_masks_tta(model, params, X, transforms=("identity", "hflip"), chunk=4))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_serve_from_artifact(model_params, tmp_path, rng):
    """The HTTP endpoint duck-types an ExportedPredictor (--artifact mode)."""
    from plastic_unet_tpu.submit.http_server import serve

    model, params = model_params
    path = export_predictor(model, params, str(tmp_path / "art"), chunk=4, threshold=0.5)
    predictor = load_predictor(path)
    srv = serve(predictor, port=0, block=False)
    try:
        host, port = srv.server_address
        imgs = rng.standard_normal((2, SIZE, SIZE)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, imgs, allow_pickle=False)
        req = urllib.request.Request(f"http://{host}:{port}/predict", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            preds = np.load(io.BytesIO(r.read()), allow_pickle=False)
        np.testing.assert_array_equal(preds.astype(np.uint8), predictor.predict(imgs))
        req = urllib.request.Request(f"http://{host}:{port}/predict_rle", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read()) == predictor.predict_rle(imgs)
    finally:
        srv.shutdown()


def test_multichannel_warmup(tmp_path, rng):
    """warmup() on a multi-channel artifact builds a correctly-shaped dummy
    batch (a single-channel hardcode would raise at serve() startup)."""
    model = UNetPRes(nbf=SIZE, neurons=2, n_channels=3)
    vs = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), model.initial_zero_hebb(1)
    )
    path = export_predictor(model, vs["params"], str(tmp_path / "art3c"), chunk=2)
    pred = load_predictor(path).warmup()
    out = pred.predict(rng.standard_normal((3, SIZE, SIZE, 3)).astype(np.float32))
    assert out.shape == (3, SIZE, SIZE)


def test_sharded_artifact_exact(model_params, tmp_path, rng):
    """A DP-sharded artifact (data_devices=4 over the virtual CPU mesh)
    reloads, partitions each chunk's batch axis across devices, and matches
    the single-device artifact to 1 ULP — zero-trace serving is pure batch
    partitioning (no collectives), but the partitioned executable's
    per-device batch shape changes XLA's fusion/tiling, so isolated sigmoid
    pixels can differ by one ULP (measured 6e-8 on <0.1% of pixels)."""
    model, params = model_params
    p1 = export_predictor(model, params, str(tmp_path / "art1"), chunk=4)
    p4 = export_predictor(model, params, str(tmp_path / "art4"), chunk=4, data_devices=4)
    meta = json.load(open(p4 + "/meta.json"))
    assert meta["data_devices"] == 4

    a1 = load_predictor(p1)
    a4 = load_predictor(p4).warmup()
    X = rng.standard_normal((10, SIZE, SIZE, 1)).astype(np.float32)  # partial chunk
    got, want = a4.predict(X), a1.predict(X)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1.5e-7)

    # live-path agreement at the same tolerance
    live = np.asarray(predict_masks_tta(model, params, X, chunk=4))
    np.testing.assert_allclose(got, live, rtol=0, atol=1.5e-7)


def test_sharded_artifact_validation(model_params, tmp_path):
    """chunk must divide by data_devices; oversubscribed exports fail with a
    clear error instead of an XLA mesh failure."""
    model, params = model_params
    with pytest.raises(ValueError, match="divisible by data_devices"):
        export_predictor(model, params, str(tmp_path / "bad"), chunk=6, data_devices=4)
    with pytest.raises(ValueError, match="local devices"):
        export_predictor(model, params, str(tmp_path / "bad2"), chunk=16, data_devices=16)


def test_bf16_artifact(model_params, tmp_path, rng):
    """A mixed-precision artifact (bf16 trunk matmuls baked into the
    StableHLO) reloads bit-equal to the live bf16 serving forward, records
    compute_dtype in the manifest, and tracks the fp32 path within bf16
    resolution."""
    model, params = model_params
    bf16 = UNetPRes(nbf=SIZE, neurons=2, compute_dtype=jnp.bfloat16)
    path = export_predictor(bf16, params, str(tmp_path / "art_bf16"), chunk=4)
    assert json.load(open(path + "/meta.json"))["compute_dtype"] == "bfloat16"

    pred = load_predictor(path).warmup()
    X = rng.standard_normal((6, SIZE, SIZE, 1)).astype(np.float32)
    got = pred.predict(X)
    assert got.dtype == np.float32  # sigmoid output stays f32
    live = np.asarray(predict_masks_tta(bf16, params, X, chunk=4))
    np.testing.assert_array_equal(got, live)

    f32 = np.asarray(predict_masks_tta(model, params, X, chunk=4))
    np.testing.assert_allclose(got, f32, rtol=0, atol=2e-2)


def test_bf16_from_pth_rejected_for_classic_arch(tmp_path):
    """compute_dtype is a unet_res-only knob; the classic arch fails fast."""
    from plastic_unet_tpu.submit.server import MaskPredictor

    with pytest.raises(ValueError, match="unet_res-only"):
        MaskPredictor.from_pth(str(tmp_path / "x.pth"), arch="unet",
                               compute_dtype=jnp.bfloat16)


def test_cli_export_new_flags(model_params, tmp_path, rng):
    """--compute-dtype bfloat16 + --data-devices 2 plumb through the parser:
    the manifest records both, and the artifact predicts through the sharded
    bf16 graph."""
    pytest.importorskip("torch")
    from plastic_unet_tpu.cli.export_model import main
    from plastic_unet_tpu.utils.torch_interop import (
        flax_params_to_state_dict,
        save_pth,
        unetp_res_name_map,
    )

    _, params = model_params
    pth = str(tmp_path / "m.pth")
    save_pth(flax_params_to_state_dict(params, unetp_res_name_map()), pth)
    out = str(tmp_path / "artifact")
    main(["--model", pth, "--out", out, "--nbf", str(SIZE), "--neurons", "2",
          "--chunk", "4", "--platforms", "cpu",
          "--compute-dtype", "bfloat16", "--data-devices", "2"])
    meta = json.load(open(out + "/meta.json"))
    assert meta["compute_dtype"] == "bfloat16"
    assert meta["data_devices"] == 2

    bf16 = UNetPRes(nbf=SIZE, neurons=2, compute_dtype=jnp.bfloat16)
    X = rng.standard_normal((3, SIZE, SIZE, 1)).astype(np.float32)
    got = load_predictor(out).predict(X)
    want = np.asarray(predict_masks_tta(bf16, params, X, chunk=4))
    np.testing.assert_allclose(got, want, rtol=0, atol=1.5e-7)


def test_export_rejects_nonpositive_data_devices(model_params, tmp_path):
    """data_devices=0 must not silently export a single-device graph while
    recording a 0-device manifest."""
    model, params = model_params
    with pytest.raises(ValueError, match="data_devices must be >= 1"):
        export_predictor(model, params, str(tmp_path / "bad"), data_devices=0)
