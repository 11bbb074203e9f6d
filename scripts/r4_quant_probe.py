#!/usr/bin/env python3
"""Round-4 serving probe: int8 PTQ serving vs bf16/fp32 at the tuned config.

Rationale: the serving path is conv-bound at 36.5% bf16 MFU (PERF.md round-2
serving section), and the TPU v5e MXU executes int8 at 2x the bf16 rate
(394 vs 197 TOP/s) — int8 is the one dtype lever above bf16. The quantized
path (ops/quant.py) adds only elementwise quant/dequant around each conv
(XLA-fusable), so the measured speedup isolates the MXU dtype effect.

Measures 2-view TTA imgs/s at chunk=128 for fp32 / bf16 / int8 / int8+bf16
(bf16 dequant output), plus an int8 chunk sweep (the optimal chunk may grow:
int8 activations are 4x smaller). Prints one JSON line per measurement.

Run on the real TPU: PROBE_IMAGES=4096 python3 scripts/r4_quant_probe.py
"""

import json
import os
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def main():
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_2
    from plastic_unet_tpu.submit.inference import predict_masks_tta
    from plastic_unet_tpu.submit.quant import quantize_for_serving
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    n = int(os.environ.get("PROBE_IMAGES", 4096))
    timgs, _ = synthetic_tiles(n, size=101, seed=1)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    out = {}

    def _dump():
        suffix = "_cpu" if jax.default_backend() == "cpu" else ""
        with open(f"/tmp/r4_quant{suffix}.json", "w") as f:
            json.dump(out, f, indent=1)

    base = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16)
    params = base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)), base.initial_zero_hebb(1)
    )["params"]

    def bench(key, model, variables, chunk=128):
        @jax.jit
        def run(X):
            preds = predict_masks_tta(model, variables, X, transforms=TTA_VIEWS_2, chunk=chunk)
            return jnp.sum(preds > 0.5)

        _sync(run(Xt))
        t0 = time.time()
        _sync(run(Xt))
        dt = time.time() - t0
        out[key] = round(n / dt, 1)
        print(json.dumps({key: out[key]}), flush=True)
        _dump()

    # dtype ladder at the tuned chunk
    bench("fp32_tta2_imgs_per_sec", base, params)
    bench("bf16_tta2_imgs_per_sec", base.clone(compute_dtype=jnp.bfloat16), params)

    qmodel, qvars = quantize_for_serving(base, params, Xt[:256])
    bench("int8_tta2_imgs_per_sec", qmodel, qvars)

    qmodel_b, qvars_b = quantize_for_serving(
        base.clone(compute_dtype=jnp.bfloat16), params, Xt[:256]
    )
    bench("int8_bf16_tta2_imgs_per_sec", qmodel_b, qvars_b)

    # int8 chunk sweep (4x smaller activations may move the chunk knee)
    for chunk in (256, 512):
        bench(f"int8_bf16_tta2_chunk{chunk}_imgs_per_sec", qmodel_b, qvars_b, chunk=chunk)

    if out.get("bf16_tta2_imgs_per_sec"):
        best_int8 = max(v for k, v in out.items() if k.startswith("int8"))
        out["int8_vs_bf16_speedup"] = round(best_int8 / out["bf16_tta2_imgs_per_sec"], 3)
    print("FINAL " + json.dumps(out), flush=True)
    _dump()


if __name__ == "__main__":
    main()
