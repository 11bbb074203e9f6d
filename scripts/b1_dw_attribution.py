#!/usr/bin/env python3
"""B=1 backward attribution: how much of the 1,019 us/step backward is the
dw (filter-gradient) computation vs the dx chain?

PERF.md round-2 anatomy: fwd 222.6 / bwd +1018.5 / Adam +97.8 us. A backward
should cost ~2x the forward; 4.6x suggests the B=1 filter-gradient convs
(degenerate 101x101-kernel convs) are the excess. Custom-VJP replacements all
lost to the integration penalty (PERF.md), so before trying a *forward*
representation change we attribute: variant `dx_only` takes grads w.r.t. the
input image + plastic-head params only (the full dx chain runs, every trunk
dw is dead code), so T(full) - T(dx_only) ~= marginal trunk-dw (+trunk Adam,
~90 us known) cost.

Run on the real TPU (background; the relay admits one client).
"""

import json
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.ops.losses import bce_logits
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="hebb")
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)

    S = 2048
    imgs, masks = synthetic_tiles(512, size=101, seed=0)
    imgs = np.tile(imgs, (S // 512, 1, 1, 1))
    masks = np.tile(masks, (S // 512, 1, 1, 1))
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=1)

    rng = jax.random.PRNGKey(1)
    params = state.params
    head = {k: params[k] for k in ("w", "alpha", "eta")}
    trunk = {k: v for k, v in params.items() if k not in head}

    results = {}

    def timed(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        compile_s = time.time() - t0
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        dt = time.time() - t0
        results[name] = {"us_per_step": dt / S * 1e6, "imgs_per_sec": S / dt, "compile_s": compile_s}
        print(name, results[name], flush=True)

    # ---- variant 1: forward only --------------------------------------
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

    timed("fwd_only", fwd_epoch, state.hebb, Xl, Yl)

    # ---- variant 2: dx chain + head grads only (all trunk dw dead) ----
    def loss_img_head(img, head_p, mask, hebb, drop_rng):
        p = dict(trunk, **head_p)
        out = model.apply({"params": p}, img, jax.lax.stop_gradient(hebb),
                          train=True, rngs={"dropout": drop_rng})
        return bce_logits(out.activ, mask), out.hebb

    head_tx = optax.adam(3e-4)
    head_opt0 = head_tx.init(head)

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

    timed("dx_plus_head", dx_epoch, state.hebb, head, head_opt0, Xl, Yl)

    # ---- variant 3: the real full step (baseline) ----------------------
    epoch_fn = make_epoch_fn(model, tx, loss_space="logits", donate=False)
    timed("full_step", epoch_fn, state, Xl, Yl, rng)

    full = results["full_step"]["us_per_step"]
    dx = results["dx_plus_head"]["us_per_step"]
    fwd = results["fwd_only"]["us_per_step"]
    results["derived"] = {
        "fwd_us": fwd,
        "dx_chain_plus_head_bwd_us": dx - fwd,
        "trunk_dw_plus_trunk_adam_marginal_us": full - dx,
    }
    print(json.dumps(results), flush=True)
    with open("/tmp/b1_dw_attribution.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
