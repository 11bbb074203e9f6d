#!/usr/bin/env python3
"""Round-3 probe: patch_conv in bf16 (newly enabled — the round-2 patch path
was fp32-only). Round 1 measured plain bf16 as no-help at B=1 when the step
was launch-bound; after the patch_conv fix the step is matmul-shaped, so
bf16 MXU passes may now pay. Also: does bf16+patch lift the 128-lane
saturation point (8.3k imgs/s, 26% MFU)?
"""

import json
import os
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def bench_train(lanes, steps, patch_conv=0, bf16=False):
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     patch_conv=patch_conv,
                     compute_dtype=jnp.bfloat16 if bf16 else None)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=lanes)
    n = steps * lanes
    base = min(n, 512)
    imgs, masks = synthetic_tiles(base, size=101, seed=0)
    reps = -(-n // base)
    imgs = np.tile(imgs, (reps, 1, 1, 1))[:n]
    masks = np.tile(masks, (reps, 1, 1, 1))[:n]
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=lanes)
    epoch_fn = make_epoch_fn(model, tx, loss_space="logits", donate=False)
    rng = jax.random.PRNGKey(1)
    s, losses = epoch_fn(state, Xl, Yl, rng)
    _sync(losses)
    t0 = time.time()
    s, losses = epoch_fn(s, Xl, Yl, rng)
    _sync(losses)
    return n / (time.time() - t0)


def main():
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    S = int(os.environ.get("PROBE_STEPS", 2048))
    out = {}

    def rec(key, val):
        out[key] = round(val, 1)
        print(json.dumps({key: out[key]}), flush=True)

    rec("b1_bf16_plain", bench_train(1, S, bf16=True))
    rec("b1_bf16_patch32", bench_train(1, S, patch_conv=32, bf16=True))
    rec("lanes8_bf16_patch32", bench_train(8, max(S // 8, 64), patch_conv=32, bf16=True))
    rec("lanes128_bf16_patch32", bench_train(128, 12, patch_conv=32, bf16=True))

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
