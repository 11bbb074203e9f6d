#!/usr/bin/env python3
"""Round-4 attribution of the 128-lane bf16 training step (VERDICT r03 item
2): where do the 15.5 ms/step (8.2k imgs/s, 25.7% MFU) go, and is the step
compute- or HBM-bound?

The axon relay exposes no device profiler (PERF.md), so attribution is by
measured ablation (the established slope method: two scan lengths, the
difference cancels the per-dispatch relay roundtrip) plus XLA cost_analysis
(flops + bytes accessed) of the standalone step:

  full         the real train step (make_epoch_fn baseline)
  fwd_only     forward + trace only       -> backward+Adam = full - fwd
  dx_plus_head trunk dw dead-coded        -> trunk dw      = full - dx
  nodrop       dropout_ratio=0.0          -> dropout RNG+mask marginal
  rbg          hardware RNG for dropout   -> threefry marginal
  vanilla_head plastic=False              -> plastic-head marginal
  fp32_full    same step in fp32          -> bf16 gain check

Run on the real TPU (background; the relay admits one client):
  python3 scripts/r4_lane_attribution.py [lanes] [steps]
"""

import json
import sys
import time

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0])


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S2 = int(sys.argv[2]) if len(sys.argv) > 2 else 48  # long run; short = S2//2

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
    S1 = S2 // 2
    results = {"lanes": lanes, "steps_long": S2, "steps_short": S1}

    def _dump():
        # Incremental write: a stage timeout must not lose already-measured
        # numbers (r4_fill_perf.py reads this file). CPU smoke runs write to
        # a _cpu-suffixed path so they never pollute the TPU record.
        suffix = "_cpu" if jax.default_backend() == "cpu" else ""
        with open(f"/tmp/r4_lane{lanes}_attribution{suffix}.json", "w") as f:
            json.dump(results, f, indent=1)

    def stream(S, seed=0):
        n = S * lanes
        base = min(n, 512)
        imgs, masks = synthetic_tiles(base, size=101, seed=seed)
        reps = -(-n // base)
        imgs = np.tile(imgs, (reps, 1, 1, 1))[:n]
        masks = np.tile(masks, (reps, 1, 1, 1))[:n]
        X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
        Y = jnp.asarray(masks[:, 0])
        return reshape_stream(X, Y, lanes=lanes)

    Xl2, Yl2 = stream(S2)
    Xl1, Yl1 = Xl2[:S1], Yl2[:S1]
    rng = jax.random.PRNGKey(1)

    def slope_time(fn, *common):
        """us/step net of the per-dispatch relay roundtrip."""
        _sync(fn(Xl1, Yl1, *common))  # compile (short shape)
        _sync(fn(Xl2, Yl2, *common))  # compile (long shape)
        t0 = time.time()
        _sync(fn(Xl1, Yl1, *common))
        dt1 = time.time() - t0
        t0 = time.time()
        _sync(fn(Xl2, Yl2, *common))
        dt2 = time.time() - t0
        return (dt2 - dt1) / (S2 - S1) * 1e6

    def bench_model(name, model, tx, loss_space="logits"):
        state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=lanes)
        epoch_fn = make_epoch_fn(model, tx, loss_space=loss_space, donate=False)

        def run(X, Y, st):
            return epoch_fn(st, X, Y, rng)[1]

        us = slope_time(run, state)
        results[name] = {"us_per_step": us, "imgs_per_sec": lanes / us * 1e6}
        print(name, results[name], flush=True)
        _dump()
        return state, epoch_fn

    bf16 = jnp.bfloat16
    tx = adam_step_lr(3e-4, 0.666, 1e5)

    # ---- baseline: the real 128-lane bf16 step -------------------------
    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, compute_dtype=bf16)
    state, _ = bench_model("full", model, tx)

    # XLA's own analysis of the standalone step: flops + HBM bytes -> which
    # roofline binds.
    from plastic_unet_tpu.train.loop import make_train_step

    step_fn = jax.jit(make_train_step(model, tx, loss_space="logits"))
    ca = step_fn.lower(state, (Xl2[0], Yl2[0]), rng).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    us_full = results["full"]["us_per_step"]
    results["cost_analysis"] = {
        "step_gflops": flops / 1e9,
        "step_gbytes": byts / 1e9,
        "arithmetic_intensity_flops_per_byte": flops / byts if byts else None,
        "mfu_at_197tflops": flops / (us_full * 1e-6) / 197e12,
        "hbm_util_at_819gbs": byts / (us_full * 1e-6) / 819e9 if byts else None,
        "note": "bytes accessed is XLA's pre-fusion estimate; treat as upper-ish bound",
    }
    print("cost_analysis", results["cost_analysis"], flush=True)
    _dump()

    # ---- forward only ---------------------------------------------------
    params = state.params

    def loss_only(p, img, mask, hebb, drop_rng):
        out = model.apply({"params": p}, img, jax.lax.stop_gradient(hebb),
                          train=True, rngs={"dropout": drop_rng})
        return bce_logits(out.activ, mask), out.hebb

    @jax.jit
    def fwd_epoch(X, Y, hebb):
        def body(carry, batch):
            hebb, step, acc = carry
            img, mask = batch
            loss, new_hebb = loss_only(params, img, mask, hebb, jax.random.fold_in(rng, step))
            return (new_hebb, step + 1, acc + loss), loss

        return jax.lax.scan(body, (hebb, jnp.zeros((), jnp.int32), 0.0), (X, Y))

    us = slope_time(fwd_epoch, state.hebb)
    results["fwd_only"] = {"us_per_step": us, "imgs_per_sec": lanes / us * 1e6}
    print("fwd_only", results["fwd_only"], flush=True)
    _dump()

    # ---- dx chain + head grads only (all trunk dw dead) -----------------
    head = {k: params[k] for k in ("w", "alpha", "eta")}
    trunk = {k: v for k, v in params.items() if k not in head}
    head_tx = optax.adam(3e-4)

    def loss_img_head(img, head_p, mask, hebb, drop_rng):
        p = dict(trunk, **head_p)
        out = model.apply({"params": p}, img, jax.lax.stop_gradient(hebb),
                          train=True, rngs={"dropout": drop_rng})
        return bce_logits(out.activ, mask), out.hebb

    @jax.jit
    def dx_epoch(X, Y, hebb, head0, hopt):
        def body(carry, batch):
            hebb, head_p, hopt, step, acc = carry
            img, mask = batch
            (loss, new_hebb), (dimg, dhead) = jax.value_and_grad(
                loss_img_head, argnums=(0, 1), has_aux=True
            )(img, head_p, mask, hebb, jax.random.fold_in(rng, step))
            upd, hopt = head_tx.update(dhead, hopt, head_p)
            head_p = optax.apply_updates(head_p, upd)
            return (new_hebb, head_p, hopt, step + 1, acc + jnp.sum(dimg)), loss

        return jax.lax.scan(body, (hebb, head, head_tx.init(head), jnp.zeros((), jnp.int32), 0.0), (X, Y))

    us = slope_time(dx_epoch, state.hebb, head, head_tx.init(head))
    results["dx_plus_head"] = {"us_per_step": us, "imgs_per_sec": lanes / us * 1e6}
    print("dx_plus_head", results["dx_plus_head"], flush=True)
    _dump()

    # ---- ablations ------------------------------------------------------
    bench_model("nodrop", UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                                   compute_dtype=bf16, dropout_ratio=0.0), tx)
    bench_model("vanilla_head", UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                                         compute_dtype=bf16, plastic=False), tx)
    bench_model("fp32_full", UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16), tx)
    # space-to-depth at lane scale (VERDICT r03 item-2 candidate): measured
    # negative at 8 lanes fp32 (PERF.md), but 128-lane bf16 changes the
    # tradeoff — folding turns the C=16 high-res levels into C=64 (4x MXU
    # lane utilization) and the scatter cost amortizes over the lane batch.
    try:
        bench_model("fold_hires", UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                                           compute_dtype=bf16, fold_hires=True), tx)
    except Exception as e:  # keep the rest of the probe alive
        results["fold_hires"] = {"error": f"{type(e).__name__}: {e}"}
        print("fold_hires FAILED:", e, flush=True)
        _dump()

    # remat_trunk at lane scale: if the step is HBM-bound on activation
    # traffic, recomputing block activations in the backward (bit-identical
    # grads, tests/test_remat.py) trades idle-MXU FLOPs for bandwidth.
    try:
        bench_model("remat_trunk", UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                                            compute_dtype=bf16, remat_trunk=True), tx)
    except Exception as e:
        results["remat_trunk"] = {"error": f"{type(e).__name__}: {e}"}
        print("remat_trunk FAILED:", e, flush=True)
        _dump()

    # rbg dropout rng on the baseline model
    model_rbg = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, compute_dtype=bf16)
    state_rbg = create_train_state(model_rbg, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=lanes)
    epoch_rbg = make_epoch_fn(model_rbg, tx, loss_space="logits", donate=False)
    rbg_key = jax.random.key(1, impl="rbg")

    def run_rbg(X, Y, st):
        return epoch_rbg(st, X, Y, rbg_key)[1]

    us = slope_time(run_rbg, state_rbg)
    results["rbg"] = {"us_per_step": us, "imgs_per_sec": lanes / us * 1e6}
    print("rbg", results["rbg"], flush=True)
    _dump()

    full = results["full"]["us_per_step"]
    results["derived"] = {
        "fwd_us": results["fwd_only"]["us_per_step"],
        "dx_chain_plus_head_bwd_us": results["dx_plus_head"]["us_per_step"] - results["fwd_only"]["us_per_step"],
        "trunk_dw_plus_adam_us": full - results["dx_plus_head"]["us_per_step"],
        "dropout_marginal_us": full - results["nodrop"]["us_per_step"],
        "plastic_head_marginal_us": full - results["vanilla_head"]["us_per_step"],
        "bf16_speedup_vs_fp32": results["fp32_full"]["us_per_step"] / full,
        "rbg_delta_us": full - results["rbg"]["us_per_step"],
    }
    if "us_per_step" in results.get("fold_hires", {}):
        results["derived"]["fold_hires_speedup"] = full / results["fold_hires"]["us_per_step"]
    if "us_per_step" in results.get("remat_trunk", {}):
        results["derived"]["remat_trunk_speedup"] = full / results["remat_trunk"]["us_per_step"]
    print(json.dumps(results), flush=True)
    _dump()


if __name__ == "__main__":
    main()
