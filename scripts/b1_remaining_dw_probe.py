#!/usr/bin/env python3
"""Fine attribution of the remaining dw cost at patch_conv=32 (1018 us/step):
time the full step with selected param groups frozen (closed over as
constants), so their dw computations are dead code. Marginals attribute cost.

Groups: ConvTranspose kernels; all convs with Cin>=64 (unpatched levels);
the 1x1 outconv."""

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
    import optax

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.ops.losses import bce_logits
    from plastic_unet_tpu.train.loop import create_train_state, reshape_stream
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

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="hebb", patch_conv=32)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
    params = state.params
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def split(pred):
        live, frozen = {}, {}
        for path, leaf in flat:
            key = "/".join(str(p.key) for p in path)
            (frozen if pred(key, leaf) else live)[key] = leaf
        return live, frozen

    def rebuild(live, frozen):
        merged = dict(live)
        merged.update({k: jax.lax.stop_gradient(v) for k, v in frozen.items()})
        leaves = [merged["/".join(str(p.key) for p in path)] for path, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    results = {}

    def timed(name, pred):
        live, frozen = split(pred)
        sub_tx = optax.adam(3e-4)

        def loss_fn(live_p, img, mask, hebb, drop_rng):
            p = rebuild(live_p, frozen)
            out = model.apply({"params": p}, img, jax.lax.stop_gradient(hebb),
                              train=True, rngs={"dropout": drop_rng})
            return bce_logits(out.activ, mask), out.hebb

        @jax.jit
        def epoch(hebb, live0, opt0, X, Y):
            def body(carry, batch):
                hebb, lp, op, step = carry
                img, mask = batch
                drop_rng = jax.random.fold_in(rng, step)
                (loss, new_hebb), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    lp, img, mask, hebb, drop_rng
                )
                upd, op = sub_tx.update(g, op, lp)
                lp = optax.apply_updates(lp, upd)
                return (new_hebb, lp, op, step + 1), loss

            return jax.lax.scan(body, (hebb, live0, opt0, jnp.zeros((), jnp.int32)), (X, Y))

        opt0 = sub_tx.init(live)
        t0 = time.time()
        out = epoch(state.hebb, live, opt0, Xl, Yl)
        _sync(out)
        c = time.time() - t0
        t0 = time.time()
        out = epoch(state.hebb, live, opt0, Xl, Yl)
        _sync(out)
        dt = time.time() - t0
        results[name] = {"us_per_step": dt / S * 1e6, "imgs_per_sec": S / dt, "compile_s": c,
                         "n_frozen": len(frozen)}
        print(name, results[name], flush=True)

    timed("freeze_nothing", lambda k, v: False)
    timed("freeze_convT", lambda k, v: "ConvTranspose" in k)
    timed("freeze_wide_convs", lambda k, v: k.endswith("kernel") and v.ndim == 4
          and v.shape[0] == 3 and v.shape[2] >= 64)
    timed("freeze_outconv", lambda k, v: "Conv_" in k and v.ndim == 4 and v.shape[0] == 1)

    print(json.dumps(results), flush=True)
    with open("/tmp/b1_remaining_dw.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
