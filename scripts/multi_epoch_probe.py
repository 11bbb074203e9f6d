#!/usr/bin/env python3
"""Measure the multi-epoch dispatch win (cfg.epochs_per_dispatch) at sweep
scale: small epochs (S samples) x E epochs, K=1 vs K=chunk. The ~50 ms
per-dispatch overhead (PERF.md) should be amortized K-fold."""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import (
        create_train_state,
        make_epoch_fn,
        make_multi_epoch_fn,
        reshape_stream,
    )
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    S = int(os.environ.get("PROBE_SAMPLES", 100))
    E = int(os.environ.get("PROBE_EPOCHS", 20))
    K = int(os.environ.get("PROBE_K", 10))

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="hebb", patch_conv=32)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    imgs, masks = synthetic_tiles(S, size=101, seed=3)
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    X, Y = reshape_stream(X, Y, 1)
    rng = jax.random.PRNGKey(0)

    def run_single():
        # mirrors the driver: losses come back to host EVERY epoch
        # (train/driver.py np.asarray per dispatch — a relay roundtrip each)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
        for e in range(E):
            state = state._replace(hebb=jnp.zeros_like(state.hebb))
            state, losses = run_single.fn(state, X, Y, jax.random.fold_in(rng, e))
            np.asarray(losses)  # per-epoch host sync, as the driver does
        return state

    run_single.fn = make_epoch_fn(model, tx, donate=False)

    multi_fn = make_multi_epoch_fn(model, tx, donate=False)

    def run_multi():
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
        for e0 in range(0, E, K):
            k = min(K, E - e0)
            erngs = jnp.stack([jax.random.fold_in(rng, e0 + j) for j in range(k)])
            state, losses = multi_fn(state, X, Y, erngs, erngs, erngs)
            np.asarray(losses)  # per-chunk host sync, as the driver does
        return state

    # warm both compiles
    t0 = time.time(); s1 = run_single(); t_compile_single = time.time() - t0
    t0 = time.time(); s2 = run_multi(); t_compile_multi = time.time() - t0

    # equivalence spot-check (same keys, shuffle/augment off)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t0 = time.time(); run_single(); t_single = time.time() - t0
    t0 = time.time(); run_multi(); t_multi = time.time() - t0

    print(json.dumps({
        "samples_per_epoch": S, "epochs": E, "k": K,
        "single_dispatch_s": round(t_single, 3),
        "multi_dispatch_s": round(t_multi, 3),
        "speedup": round(t_single / t_multi, 3),
        "single_imgs_per_sec": round(S * E / t_single, 1),
        "multi_imgs_per_sec": round(S * E / t_multi, 1),
        "first_run_single_s": round(t_compile_single, 1),
        "first_run_multi_s": round(t_compile_multi, 1),
    }))


if __name__ == "__main__":
    main()
