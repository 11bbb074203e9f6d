#!/usr/bin/env python3
"""A/B conv3_same_taps for the wide (Cin>=64) levels at patch_conv=32."""

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
    from plastic_unet_tpu.ops import patch_conv as pc
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    S = int(os.environ.get("PROBE_STEPS", 2048))
    imgs, masks = synthetic_tiles(512, size=101, seed=0)
    imgs = np.tile(imgs, (-(-S // 512), 1, 1, 1))[:S]
    masks = np.tile(masks, (-(-S // 512), 1, 1, 1))[:S]
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=1)
    rng = jax.random.PRNGKey(1)

    results = {}
    for name, tap in (("tap_wide_on", True), ("tap_wide_off", False)):
        pc.TAP_WIDE = tap
        model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="hebb", patch_conv=32)
        tx = adam_step_lr(3e-4, 0.666, 1e5)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
        epoch_fn = make_epoch_fn(model, tx, loss_space="logits", donate=False)
        t0 = time.time()
        s, losses = epoch_fn(state, Xl, Yl, rng)
        _sync(losses)
        compile_s = time.time() - t0
        t0 = time.time()
        s, losses = epoch_fn(s, Xl, Yl, rng)
        _sync(losses)
        dt = time.time() - t0
        results[name] = {"us_per_step": dt / S * 1e6, "imgs_per_sec": S / dt, "compile_s": compile_s}
        print(name, results[name], flush=True)

    print(json.dumps(results), flush=True)
    with open("/tmp/b1_tap_probe.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
