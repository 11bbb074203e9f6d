#!/usr/bin/env python3
"""Round-3 serving probes (VERDICT r02 items 5+8):
  * 8-view (full dihedral) TTA throughput vs the 2/4-view points;
  * batched-views TTA (fold the T views into one chunked pass,
    predict_masks_tta(batch_views=True)) vs T sequential passes.
All at the measured-best chunk=128, n=4096 tiles, fp32 and bf16 trunk.
Prints one JSON line per measurement (partial results survive a hang).
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
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_2, TTA_VIEWS_4, TTA_VIEWS_8
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
        for views_name, views in (("tta2", TTA_VIEWS_2), ("tta4", TTA_VIEWS_4), ("tta8", TTA_VIEWS_8)):
            for mode_name, batched in (("seq", False), ("batched", True)):
                @jax.jit
                def run(X):
                    preds = predict_masks_tta(
                        model, params, X, transforms=views, chunk=128, batch_views=batched
                    )
                    return jnp.sum(preds > 0.5)

                _sync(run(Xt))
                t0 = time.time()
                _sync(run(Xt))
                dt = time.time() - t0
                key = f"{dtype_name}_{views_name}_{mode_name}_imgs_per_sec"
                out[key] = round(n / dt, 1)
                print(json.dumps({key: out[key]}), flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
