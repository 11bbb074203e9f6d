#!/usr/bin/env python3
"""Round-3 trunk_pad probe (VERDICT r02 item 2): measure the MXU-aligned
padded-128 trunk against the round-2 champions on the real chip.

  * B=1 parity-shaped train step (same per-sample semantics; trunk geometry
    is an extension): baseline patch_conv=32 vs trunk_pad=128 (with and
    without patch_conv — the 128/64 px levels change which gates fire).
  * 128-lane bf16 train: pad=0 vs pad=128.
  * serving: 2-view TTA bf16 chunk=128, pad=0 vs pad=128.

Prints one JSON line per measurement (partials survive a hang).
"""

import json
import os
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def bench_train(lanes, steps, trunk_pad=0, patch_conv=0, compute_dtype=None):
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    if compute_dtype == "bfloat16":
        compute_dtype = jnp.bfloat16
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     trunk_pad=trunk_pad, patch_conv=patch_conv, compute_dtype=compute_dtype)
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


def bench_serve(trunk_pad, n=4096):
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.inference import predict_masks_tta

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     trunk_pad=trunk_pad, compute_dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)), model.initial_zero_hebb(1)
    )["params"]
    timgs, _ = synthetic_tiles(n, size=101, seed=1)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    @jax.jit
    def run(X):
        preds = predict_masks_tta(model, params, X, transforms=("identity", "hflip"), chunk=128)
        return jnp.sum(preds > 0.5)

    _sync(run(Xt))
    t0 = time.time()
    _sync(run(Xt))
    return n / (time.time() - t0)


def main():
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    S = int(os.environ.get("PROBE_STEPS", 2048))
    out = {}

    def rec(key, val):
        out[key] = round(val, 1)
        print(json.dumps({key: out[key]}), flush=True)

    rec("b1_baseline_patch32", bench_train(1, S, trunk_pad=0, patch_conv=32))
    rec("b1_pad128", bench_train(1, S, trunk_pad=128, patch_conv=0))
    rec("b1_pad128_patch32", bench_train(1, S, trunk_pad=128, patch_conv=32))
    rec("lanes128_bf16_baseline", bench_train(128, 12, compute_dtype="bfloat16"))
    rec("lanes128_bf16_pad128", bench_train(128, 12, trunk_pad=128, compute_dtype="bfloat16"))
    rec("serve_bf16_tta2_baseline", bench_serve(0))
    rec("serve_bf16_tta2_pad128", bench_serve(128))

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
