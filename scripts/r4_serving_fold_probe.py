#!/usr/bin/env python3
"""Round-4 serving probe: space-to-depth folding (fold_hires) on the
inference path at the measured-best chunk=128 serving config.

Rationale (VERDICT r03 item 2 candidate list): the serving path tops out
at 36.5% MFU (bf16 2-view TTA) and is conv-bound on the same thin-channel
(C=16) high-res levels as training. fold_hires turns those levels into
C=64 (4x MXU lane utilization); it measured NEGATIVE at 8-lane fp32
TRAINING (PERF.md), but inference has no backward (the 4x-MAC sparse
folded dw never happens) and chunk=128 amortizes the kernel-embedding
scatter — the tradeoff is genuinely different here.

Prints one JSON line per measurement (partial results survive a hang).
Run on the real TPU: PROBE_IMAGES=4096 python3 scripts/r4_serving_fold_probe.py
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
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    n = int(os.environ.get("PROBE_IMAGES", 4096))
    timgs, _ = synthetic_tiles(n, size=101, seed=1)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    out = {}

    def _dump():
        # Incremental write: a stage timeout must not lose already-measured
        # numbers (r4_fill_perf.py reads this file). CPU smoke runs write to
        # a _cpu-suffixed path so they never pollute the TPU record.
        suffix = "_cpu" if jax.default_backend() == "cpu" else ""
        with open(f"/tmp/r4_serving_fold{suffix}.json", "w") as f:
            json.dump(out, f, indent=1)

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("fp32", None)):
        for fold in (False, True):
            model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                             compute_dtype=dtype, fold_hires=fold)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)), model.initial_zero_hebb(1)
            )["params"]

            @jax.jit
            def run(X):
                preds = predict_masks_tta(
                    model, params, X, transforms=TTA_VIEWS_2, chunk=128
                )
                return jnp.sum(preds > 0.5)

            _sync(run(Xt))
            t0 = time.time()
            _sync(run(Xt))
            dt = time.time() - t0
            key = f"{dtype_name}_fold{int(fold)}_tta2_imgs_per_sec"
            out[key] = round(n / dt, 1)
            print(json.dumps({key: out[key]}), flush=True)
            _dump()

    if out.get("bf16_fold0_tta2_imgs_per_sec"):
        out["bf16_fold_speedup"] = round(
            out["bf16_fold1_tta2_imgs_per_sec"] / out["bf16_fold0_tta2_imgs_per_sec"], 3
        )
    print("FINAL " + json.dumps(out), flush=True)
    _dump()


if __name__ == "__main__":
    main()
