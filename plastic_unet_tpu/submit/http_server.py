"""Minimal production-style HTTP serving endpoint for mask prediction.

Stdlib-only (ThreadingHTTPServer) around submit.server.MaskPredictor:

  GET  /healthz            -> {"status": "ok", "device": ...}
  POST /predict            -> request body: .npy (N, H, W[, 1]) float array
                              response: .npy (N, nbf, nbf) float32 masks
  POST /predict_rle        -> request body: .npy as above
                              response: JSON list of RLE strings (requires a
                              threshold configured on the predictor)

The predictor compiles once at warmup; requests are serialized through a
lock (single accelerator) while IO threads overlap. Run:
  python3 -m plastic_unet_tpu.submit.http_server --model out/train_net.pth
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(predictor, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                payload = json.dumps({"status": "ok", "device": str(jax.devices()[0])}).encode()
                self._send(200, payload, "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path not in ("/predict", "/predict_rle"):
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                arr = np.load(io.BytesIO(self.rfile.read(length)), allow_pickle=False)
                with lock:
                    if self.path == "/predict":
                        preds = predictor.predict(arr).astype(np.float32)
                        buf = io.BytesIO()
                        np.save(buf, preds, allow_pickle=False)
                        self._send(200, buf.getvalue(), "application/octet-stream")
                    else:
                        rles = predictor.predict_rle(arr)
                        self._send(200, json.dumps(rles).encode(), "application/json")
            except Exception as e:  # noqa: BLE001 — surface errors to the client
                self._send(400, str(e).encode(), "text/plain")

    return Handler


def serve(predictor, host: str = "127.0.0.1", port: int = 8600, *, block: bool = True):
    """Start the server (warmup first). Returns the server object; when
    block=False the caller owns shutdown()."""
    predictor.warmup()
    server = ThreadingHTTPServer((host, port), make_handler(predictor, threading.Lock()))
    if block:
        print(f"serving mask prediction on http://{host}:{port}")
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def build_parser():
    import argparse

    p = argparse.ArgumentParser(description="Serve plastic U-Net mask prediction over HTTP")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--model", help=".pth checkpoint (reference format)")
    src.add_argument("--artifact", help="exported serving artifact directory "
                     "(plastic-unet-export); the model-shape/tta/threshold/chunk "
                     "flags are baked into the artifact and rejected here")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8600, type=int)
    p.add_argument("--nbf", default=101, type=int)
    p.add_argument("--neurons", default=16, type=int)
    p.add_argument("--prule", default="hebb")
    p.add_argument("--tta", default="identity",
                   help="preset tta2/tta4/tta8 or comma list of dihedral views")
    p.add_argument("--threshold", type=float, default=None)
    # 128 is the measured serving sweet spot (PERF.md serving section);
    # matches MaskPredictor's default.
    p.add_argument("--chunk", default=128, type=int)
    return p


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.artifact:
        # Model-configuration flags are baked into the artifact at export
        # time; silently ignoring an explicit --threshold/--tta/... would
        # serve something other than what the user asked for (e.g.
        # probability masks when they expected binary). Reject instead.
        baked = ("tta", "threshold", "chunk", "nbf", "neurons", "prule")
        passed = [f for f in baked if getattr(args, f) != parser.get_default(f)]
        if passed:
            parser.error(
                "--artifact serves the exported configuration; "
                + ", ".join("--" + f for f in passed)
                + " cannot be overridden (re-export with plastic-unet-export)"
            )

    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.artifact:
        from plastic_unet_tpu.submit.export import load_predictor

        predictor = load_predictor(args.artifact)
    else:
        from plastic_unet_tpu.ops.augment import parse_tta
        from plastic_unet_tpu.submit.server import MaskPredictor

        predictor = MaskPredictor.from_pth(
            args.model, nbf=args.nbf, neurons=args.neurons, rule=args.prule,
            tta=parse_tta(args.tta), threshold=args.threshold, chunk=args.chunk,
        )
    serve(predictor, args.host, args.port)


if __name__ == "__main__":
    main()
