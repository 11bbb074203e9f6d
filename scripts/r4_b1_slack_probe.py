#!/usr/bin/env python3
"""Round-4 B=1 software-pipelining feasibility probe (VERDICT r03 item 3).

The suggestion: overlap sample n+1's trunk forward with sample n's
head+backward+Adam. Two facts gate this:

1. LEGALITY (the dependency floor, PERF.md roadmap #2): with reference-exact
   semantics, step n+1's forward consumes params_{n+1} = Adam(params_n,
   grads_n). The forward needs the STEM params first; reverse-mode autodiff
   produces the stem's grads LAST — the bubble is the entire backward. There
   is no legal overlap window at fp32-exact parity.

2. SLACK (measured here): even if the dependency vanished, overlap only
   pays if the device has idle execution slack during the step. We measure
   it directly: add an INDEPENDENT ghost forward of the next sample (using
   the carry's pre-update params — by construction schedulable in parallel
   with the real step's forward+backward+Adam by XLA) and compare the
   marginal cost against the standalone cost of the same forward.

     marginal ~= standalone  -> zero slack: the step already saturates the
                                 core; pipelining CANNOT win even if legal.
     marginal << standalone  -> slack exists; a semantics-relaxed pipeline
                                 (stale-params trunk) would be worth a look.

Run on the real TPU (background; the relay admits one client).
"""

import json
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def main():
    import sys

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
    # the benched B=1 parity configuration (patch_conv=32)
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, patch_conv=32)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)

    S2 = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    S1 = S2 // 2
    base = min(S2, 512)
    imgs, masks = synthetic_tiles(base, size=101, seed=0)
    imgs = np.tile(imgs, (-(-S2 // base), 1, 1, 1))[:S2]
    masks = np.tile(masks, (-(-S2 // base), 1, 1, 1))[:S2]
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=1)
    Xnext = jnp.roll(Xl, -1, axis=0)  # ghost input: the NEXT sample
    rng = jax.random.PRNGKey(1)
    results = {}

    def _dump():
        # Incremental write: a stage timeout must not lose already-measured
        # numbers (r4_fill_perf.py reads this file). CPU smoke runs write to
        # a _cpu-suffixed path so they never pollute the TPU record.
        suffix = "_cpu" if jax.default_backend() == "cpu" else ""
        with open(f"/tmp/r4_b1_slack{suffix}.json", "w") as f:
            json.dump(results, f, indent=1)

    def loss_fn(p, img, mask, hebb, drop_rng):
        out = model.apply({"params": p}, img, jax.lax.stop_gradient(hebb),
                          train=True, rngs={"dropout": drop_rng})
        return bce_logits(out.activ, mask), out.hebb

    def make_epoch(ghost: bool):
        def body(carry, batch):
            st, acc = carry
            img, mask, img_next = batch
            drop_rng = jax.random.fold_in(rng, st.step)
            (loss, new_hebb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, img, mask, st.hebb, drop_rng
            )
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            if ghost:
                # independent of the grad/update chain: consumes the PRE-update
                # params (produced by the previous step) and the next sample —
                # XLA is free to schedule it anywhere inside this step
                g = model.apply({"params": jax.lax.stop_gradient(st.params)},
                                img_next, jax.lax.stop_gradient(st.hebb),
                                train=True, rngs={"dropout": jax.random.fold_in(rng, st.step + 10**6)})
                acc = acc + jnp.mean(g.activ.astype(jnp.float32))
            new_st = st._replace(params=new_params, opt_state=new_opt,
                                 hebb=new_hebb, step=st.step + 1)
            return (new_st, acc), loss

        @jax.jit
        def epoch(st, X, Y, XN):
            (st, acc), losses = jax.lax.scan(body, (st, jnp.float32(0)), (X, Y, XN))
            return losses, acc

        return epoch

    @jax.jit
    def fwd_only(st, X, Y, XN):
        def body(carry, batch):
            hebb, step, acc = carry
            img, mask, _ = batch
            loss, new_hebb = loss_fn(state.params, img, mask, hebb, jax.random.fold_in(rng, step))
            return (new_hebb, step + 1, acc + loss), loss

        return jax.lax.scan(body, (st.hebb, jnp.zeros((), jnp.int32), 0.0), (X, Y, XN))

    def slope(fn, *args_builder):
        def run(S):
            a = [x[:S] for x in (Xl, Yl, Xnext)]
            t0 = time.time()
            _sync(fn(state, *a))
            return time.time() - t0

        run(S1), run(S2)  # compile both shapes
        dt1, dt2 = run(S1), run(S2)
        return (dt2 - dt1) / (S2 - S1) * 1e6

    base_us = slope(make_epoch(ghost=False))
    results["full_step_us"] = base_us
    print("full_step", base_us, flush=True)
    _dump()
    ghost_us = slope(make_epoch(ghost=True))
    results["full_step_plus_ghost_us"] = ghost_us
    print("full_step_plus_ghost", ghost_us, flush=True)
    _dump()
    fwd_us = slope(fwd_only)
    results["standalone_fwd_us"] = fwd_us
    print("standalone_fwd", fwd_us, flush=True)
    _dump()

    marginal = ghost_us - base_us
    slack = fwd_us - marginal
    results["derived"] = {
        "ghost_marginal_us": marginal,
        "standalone_fwd_us": fwd_us,
        "overlap_slack_us": slack,
        "slack_fraction_of_fwd": slack / fwd_us if fwd_us else None,
        "interpretation": (
            "marginal ~= standalone fwd -> no idle slack, pipelining cannot win; "
            "marginal << standalone fwd -> slack exists"
        ),
    }
    print(json.dumps(results), flush=True)
    _dump()


if __name__ == "__main__":
    main()
