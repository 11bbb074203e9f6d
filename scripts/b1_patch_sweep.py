#!/usr/bin/env python3
"""Threshold sweep for patch_conv (im2col-forward convs) + post-fix
attribution: with patch_conv=32, where does the remaining time go?"""

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
    from plastic_unet_tpu.ops.losses import bce_logits
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

    def bench_model(name, model):
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

    for patch in (32,):
        bench_model(
            f"patch_conv={patch}",
            UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="hebb", patch_conv=patch),
        )

    # post-fix attribution at patch_conv=32: fwd-only and dx+head variants
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="hebb", patch_conv=32)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
    params = state.params
    head = {k: params[k] for k in ("w", "alpha", "eta")}
    trunk = {k: v for k, v in params.items() if k not in head}

    def loss_only(params, img, mask, hebb, drop_rng):
        out = model.apply({"params": params}, img, jax.lax.stop_gradient(hebb),
                          train=True, rngs={"dropout": drop_rng})
        return bce_logits(out.activ, mask), out.hebb

    @jax.jit
    def fwd_epoch(hebb, X, Y):
        def body(carry, batch):
            hebb, step, acc = carry
            img, mask = batch
            drop_rng = jax.random.fold_in(rng, step)
            loss, new_hebb = loss_only(params, img, mask, hebb, drop_rng)
            return (new_hebb, step + 1, acc + loss), loss

        return jax.lax.scan(body, (hebb, jnp.zeros((), jnp.int32), 0.0), (X, Y))

    t0 = time.time()
    out = fwd_epoch(state.hebb, Xl, Yl)
    _sync(out)
    c = time.time() - t0
    t0 = time.time()
    out = fwd_epoch(state.hebb, Xl, Yl)
    _sync(out)
    dt = time.time() - t0
    results["patch32_fwd_only"] = {"us_per_step": dt / S * 1e6, "compile_s": c}
    print("patch32_fwd_only", results["patch32_fwd_only"], flush=True)

    import optax

    def loss_img_head(img, head_p, mask, hebb, drop_rng):
        p = dict(trunk, **head_p)
        out = model.apply({"params": p}, img, jax.lax.stop_gradient(hebb),
                          train=True, rngs={"dropout": drop_rng})
        return bce_logits(out.activ, mask), out.hebb

    head_tx = optax.adam(3e-4)

    @jax.jit
    def dx_epoch(hebb, head0, hopt, X, Y):
        def body(carry, batch):
            hebb, head_p, hopt, step, acc = carry
            img, mask = batch
            drop_rng = jax.random.fold_in(rng, step)
            (loss, new_hebb), (dimg, dhead) = jax.value_and_grad(
                loss_img_head, argnums=(0, 1), has_aux=True
            )(img, head_p, mask, hebb, drop_rng)
            upd, hopt = head_tx.update(dhead, hopt, head_p)
            head_p = optax.apply_updates(head_p, upd)
            return (new_hebb, head_p, hopt, step + 1, acc + jnp.sum(dimg)), loss

        return jax.lax.scan(body, (hebb, head0, hopt, jnp.zeros((), jnp.int32), 0.0), (X, Y))

    h0 = head_tx.init(head)
    t0 = time.time()
    out = dx_epoch(state.hebb, head, h0, Xl, Yl)
    _sync(out)
    c = time.time() - t0
    t0 = time.time()
    out = dx_epoch(state.hebb, head, h0, Xl, Yl)
    _sync(out)
    dt = time.time() - t0
    results["patch32_dx_plus_head"] = {"us_per_step": dt / S * 1e6, "compile_s": c}
    print("patch32_dx_plus_head", results["patch32_dx_plus_head"], flush=True)

    print(json.dumps(results), flush=True)
    with open("/tmp/b1_patch_sweep.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
