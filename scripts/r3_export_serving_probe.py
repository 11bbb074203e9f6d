#!/usr/bin/env python3
"""Measure exported-artifact serving (submit/export.py, deserialized
StableHLO via jax.export) against the live MaskPredictor path on the real
TPU: same weights, same chunking (128, the measured sweet spot), same
end-to-end numpy-in/numpy-out contract. Also measures the baked-threshold
artifact (uint8 masks -> 4x smaller device->host transfers).

PROBE_IMAGES (default 4096) controls the batch.
"""

import json
import os
import tempfile
import time

import numpy as np


def _time_predict(predictor, imgs, repeats=2):
    predictor.predict(imgs[:1])  # warm/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = predictor.predict(imgs)
        np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.export import export_predictor, load_predictor
    from plastic_unet_tpu.submit.server import MaskPredictor
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print("device:", jax.devices()[0], flush=True)

    n = int(os.environ.get("PROBE_IMAGES", 4096))
    rng = np.random.default_rng(1)
    imgs = rng.random((n, 101, 101), dtype=np.float32)

    out = {}
    for dtype_name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, compute_dtype=dtype)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)), model.initial_zero_hebb(1)
        )["params"]
        for tta in (("identity",), ("identity", "hflip")):
            tag = f"{dtype_name}_tta{len(tta)}"
            live = MaskPredictor(model, params, chunk=128, tta=tta)
            dt = _time_predict(live, imgs)
            out[f"live_{tag}_imgs_per_sec"] = round(n / dt, 1)
            print(json.dumps({f"live_{tag}": out[f"live_{tag}_imgs_per_sec"]}), flush=True)

            with tempfile.TemporaryDirectory() as td:
                t0 = time.time()
                export_predictor(model, params, td, chunk=128, tta=tta)
                out[f"export_{tag}_seconds"] = round(time.time() - t0, 1)
                art = load_predictor(td)
                dt = _time_predict(art, imgs)
                out[f"artifact_{tag}_imgs_per_sec"] = round(n / dt, 1)
                print(json.dumps({f"artifact_{tag}": out[f"artifact_{tag}_imgs_per_sec"]}), flush=True)

            if tta == ("identity",):
                with tempfile.TemporaryDirectory() as td:
                    export_predictor(model, params, td, chunk=128, tta=tta, threshold=0.5)
                    art = load_predictor(td)
                    dt = _time_predict(art, imgs)
                    out[f"artifact_{tag}_thresh_imgs_per_sec"] = round(n / dt, 1)
                    print(json.dumps({f"artifact_{tag}_thresh": out[f"artifact_{tag}_thresh_imgs_per_sec"]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
