"""HTTP serving endpoint: health, npy predict, RLE predict."""

import io
import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.submit.http_server import serve
from plastic_unet_tpu.submit.server import MaskPredictor

SIZE = 32


@pytest.fixture(scope="module")
def server():
    model = UNetPRes(nbf=SIZE, neurons=2)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1))
    predictor = MaskPredictor(model, vs["params"], chunk=4, threshold=0.5)
    srv = serve(predictor, port=0, block=False)  # port 0 = ephemeral
    yield srv, predictor
    srv.shutdown()


def _url(srv, path):
    host, port = srv.server_address
    return f"http://{host}:{port}{path}"


def test_healthz(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"


def test_predict_npy_roundtrip(server, rng):
    srv, predictor = server
    imgs = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs, allow_pickle=False)
    req = urllib.request.Request(_url(srv, "/predict"), data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        preds = np.load(io.BytesIO(r.read()), allow_pickle=False)
    assert preds.shape == (3, SIZE, SIZE)
    want = predictor.predict(imgs)
    np.testing.assert_array_equal(preds.astype(bool), want)  # threshold configured -> bool masks


def test_predict_rle(server, rng):
    srv, predictor = server
    imgs = rng.standard_normal((2, SIZE, SIZE)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, imgs, allow_pickle=False)
    req = urllib.request.Request(_url(srv, "/predict_rle"), data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        rles = json.loads(r.read())
    assert rles == predictor.predict_rle(imgs)


def test_serve_int8_artifact(tmp_path, rng):
    """The int8 deployment recipe end-to-end: calibrate + quantize
    (submit/quant.py), export the int8 serving graph to a StableHLO artifact,
    and serve THAT over HTTP (the `plastic-unet-serve --artifact` path) —
    responses equal the live quantized forward bit-for-bit."""
    from plastic_unet_tpu.eval.evaluate import predict_masks
    from plastic_unet_tpu.submit.export import export_predictor, load_predictor
    from plastic_unet_tpu.submit.quant import quantize_for_serving

    model = UNetPRes(nbf=SIZE, neurons=2)
    vs = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 1)), model.initial_zero_hebb(1))
    Xcal = jnp.asarray(rng.random((6, SIZE, SIZE, 1)).astype(np.float32))
    qmodel, qvars = quantize_for_serving(model, vs["params"], Xcal, chunk=4)
    path = export_predictor(qmodel, qvars, str(tmp_path / "art_int8"), chunk=4, platforms=("cpu",))
    srv = serve(load_predictor(path).warmup(), port=0, block=False)
    try:
        imgs = rng.standard_normal((3, SIZE, SIZE)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, imgs, allow_pickle=False)
        req = urllib.request.Request(_url(srv, "/predict"), data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            preds = np.load(io.BytesIO(r.read()), allow_pickle=False)
        want = np.asarray(predict_masks(qmodel, qvars, imgs[..., None], chunk=4))
        np.testing.assert_array_equal(preds, want)
    finally:
        srv.shutdown()


def test_cli_defaults_use_measured_chunk():
    """The serve CLI's --chunk default must match MaskPredictor's measured
    sweet spot (128, PERF.md serving section) — VERDICT r02 weak #4."""
    import inspect

    from plastic_unet_tpu.submit.http_server import build_parser

    args = build_parser().parse_args(["--model", "x.pth"])
    assert args.chunk == 128

    from plastic_unet_tpu.submit.server import MaskPredictor

    assert inspect.signature(MaskPredictor.__init__).parameters["chunk"].default == 128


def test_bad_request(server):
    srv, _ = server
    req = urllib.request.Request(_url(srv, "/predict"), data=b"not-an-npy", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
