#!/usr/bin/env python3
"""Sweep the TTA inference chunk size (per-forward batch): the serving path
currently uses chunk=64 (bench.py, submit/inference.py default); larger
batches may lift MXU utilization on the thin-channel trunk."""

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
    from plastic_unet_tpu.submit.inference import predict_masks_tta
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    n = int(os.environ.get("PROBE_IMAGES", 4096))
    timgs, _ = synthetic_tiles(n, size=101, seed=1)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    out = {}
    for dtype_name, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, compute_dtype=dtype)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)), model.initial_zero_hebb(1)
        )["params"]
        for chunk in (64, 128, 256, 512):
            @jax.jit
            def run(X):
                preds = predict_masks_tta(
                    model, params, X, transforms=("identity", "hflip"), chunk=chunk
                )
                return jnp.sum(preds > 0.5)

            _sync(run(Xt))
            t0 = time.time()
            _sync(run(Xt))
            dt = time.time() - t0
            out[f"{dtype_name}_chunk{chunk}_imgs_per_sec"] = round(n / dt, 1)
            print(json.dumps({f"{dtype_name}_chunk{chunk}": round(n / dt, 1)}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
