#!/usr/bin/env python3
"""Round-3 sweep: patch_conv gate settings under bf16. The fp32 optimum was
max_c=32 + TAP_WIDE (996 imgs/s); bf16 halves matmul cost, so wider gates
(64 / all levels / extended / no-taps) may have a different optimum around
the new 1,107 imgs/s bf16+patch32 point."""

import json
import os
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def bench(max_c, steps, tap_wide=True, extended=False):
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.ops import patch_conv as pc

    pc.TAP_WIDE = tap_wide
    pc.EXTENDED_GATE = extended

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     patch_conv=max_c, compute_dtype=jnp.bfloat16)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
    imgs, masks = synthetic_tiles(min(steps, 512), size=101, seed=0)
    reps = -(-steps // imgs.shape[0])
    imgs = np.tile(imgs, (reps, 1, 1, 1))[:steps]
    masks = np.tile(masks, (reps, 1, 1, 1))[:steps]
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=1)
    epoch_fn = make_epoch_fn(model, tx, loss_space="logits", donate=False)
    rng = jax.random.PRNGKey(1)
    s, losses = epoch_fn(state, Xl, Yl, rng)
    _sync(losses)
    t0 = time.time()
    s, losses = epoch_fn(s, Xl, Yl, rng)
    _sync(losses)
    return steps / (time.time() - t0)


def main():
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    S = int(os.environ.get("PROBE_STEPS", 2048))
    out = {}

    def rec(key, **kw):
        out[key] = round(bench(steps=S, **kw), 1)
        print(json.dumps({key: out[key]}), flush=True)

    rec("bf16_patch32_tap", max_c=32)                      # the adopted point
    rec("bf16_patch64_tap", max_c=64)
    rec("bf16_patch128_tap", max_c=128)                    # all conv3 levels
    rec("bf16_patch32_notap", max_c=32, tap_wide=False)
    rec("bf16_patch32_tap_ext", max_c=32, extended=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
