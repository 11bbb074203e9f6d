#!/usr/bin/env python3
"""Round-5 dw-path attack at lane scale (VERDICT r04 item 5).

The round-4 attribution (PERF.md, scripts/r4_lane_attribution.py) splits the
128-lane bf16 step as: forward 4585 us, dx-chain + head backward 1712 us,
trunk dw + Adam 6183 us — the dw path is HALF the step. The B=1 dw levers
were never tried at lane scale:

* fast_dw (ops/fast_conv: hand im2col dw backward as one big matmul): at B=1
  it lost to the custom-call-in-scan pathology (+350-700 us/step) — but at
  128 lanes the epoch scan has ~12 steps of ~12,480 us, so that fixed
  per-step tax is ~4%, and the dw it replaces is ~6,000 us. If XLA's batched
  dw conv is MXU-inefficient at thin channels, this wins; if XLA is already
  efficient, it confirms the step is at its memory roofline (AI ~61 FLOP/B
  vs the v5e ridge of ~240 — see the PERF.md round-5 roofline section).
* patch_conv stays OFF at batch>1 by its own gate (measured -76% at 128
  lanes, round 3) — not re-tried.

Also re-measures base at each lane count in the same session so the
comparison is same-relay-session (r4 showed ±5% session variance).

Reuses bench.bench_train verbatim (same stream/timing/MFU semantics), so a
winner transplants directly into bench.py.

Prints one JSON line per config; incremental /tmp/r5_lane_dw.json writes.
Run on the real TPU: python3 scripts/r5_lane_dw_probe.py [total_imgs]
"""

import json
import sys
import time


def _slope_time(fn, arg, n_short: int, n_long: int):
    """Seconds per iteration via the slope method (PERF.md): time a short and
    a long scan of the same body; the difference cancels the ~25-30 ms
    per-dispatch relay roundtrip."""
    import jax
    import numpy as np
    from jax import lax

    def make(n):
        @jax.jit
        def run(x):
            return lax.fori_loop(0, n, lambda i, c: fn(c), x)
        return run

    short, long_ = make(n_short), make(n_long)
    np.asarray(jax.tree.leaves(short(arg))[0][..., :1])  # compile + warm
    np.asarray(jax.tree.leaves(long_(arg))[0][..., :1])
    t0 = time.time(); np.asarray(jax.tree.leaves(short(arg))[0][..., :1]); ts = time.time() - t0
    t0 = time.time(); np.asarray(jax.tree.leaves(long_(arg))[0][..., :1]); tl = time.time() - t0
    return (tl - ts) / (n_long - n_short)


def calibrate_hw(out):
    """Measure the ACHIEVABLE HBM bandwidth and bf16 MXU rate through this
    relay session (the roofline denominators; nominal peaks are 819 GB/s and
    197 TFLOP/s on v5e). Both are one fused op in a fori_loop, slope-timed."""
    import jax.numpy as jnp

    # HBM stream: y = x + c reads N and writes N bytes per iteration
    # (256 Mi f32 elements = 1 GiB; 2 GiB traffic/iter).
    n_elem = 256 * 1024 * 1024
    x = jnp.zeros((n_elem,), jnp.float32)
    sec = _slope_time(lambda c: c + 1.0, x, 4, 12)
    out["hbm_stream_gbps"] = round(2 * n_elem * 4 / sec / 1e9, 1)

    # MXU: bf16 4096x4096 matmul chain, 2*4096^3 = 137.4 GFLOP per iteration.
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    sec = _slope_time(lambda c: jnp.dot(c, c) * jnp.bfloat16(1e-3), a, 4, 16)
    out["mxu_bf16_tflops"] = round(2 * 4096**3 / sec / 1e12, 1)


def step_cost_analysis(lanes: int, compute_dtype):
    """XLA's own (flops, bytes-accessed) for ONE standalone training step —
    the roofline numerator pair. Arithmetic intensity = flops/bytes; with the
    calibrated HBM/MXU rates this predicts the memory-bound MFU ceiling."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_train_step
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     compute_dtype=compute_dtype)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=lanes)
    step_fn = jax.jit(make_train_step(model, tx, loss_space="logits"))
    x = jnp.zeros((lanes, 101, 101, 1))
    y = jnp.zeros((lanes, 101, 101))
    ca = step_fn.lower(state, (x, y), jax.random.PRNGKey(1)).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return {
        "flops_per_step": flops,
        "bytes_accessed_per_step": byts,
        "arith_intensity_flop_per_byte": round(flops / byts, 1) if byts else None,
    }


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import jax
    import jax.numpy as jnp

    import bench
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    out = {}

    def _dump():
        suffix = "_cpu" if jax.default_backend() == "cpu" else ""
        with open(f"/tmp/r5_lane_dw{suffix}.json", "w") as f:
            json.dump(out, f, indent=1)

    try:
        calibrate_hw(out)
    except Exception as e:  # calibration failure must not block the sweep
        out["calibration_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps({k: out[k] for k in out}), flush=True)
    _dump()

    for lanes in (128, 256):
        try:
            out[f"lanes{lanes}_step_cost"] = step_cost_analysis(lanes, jnp.bfloat16)
        except Exception as e:
            out[f"lanes{lanes}_step_cost"] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({f"lanes{lanes}_step_cost": out[f"lanes{lanes}_step_cost"]}),
              flush=True)
        _dump()
        steps = max(total // lanes, 6)
        for name, kw in (
            ("base", {}),
            ("fast_dw", {"fast_dw": True}),
        ):
            key = f"lanes{lanes}_{name}"
            try:
                ips, compile_s, mfu = bench.bench_train(
                    lanes, steps, compute_dtype=jnp.bfloat16, **kw
                )
                out[key] = {
                    "imgs_per_sec": round(ips, 1),
                    "mfu": round(mfu, 4) if mfu else None,
                    "compile_s": round(compile_s, 1),
                }
            except Exception as e:
                out[key] = {"error": f"{type(e).__name__}: {e}"}
            print(json.dumps({key: out[key]}), flush=True)
            _dump()

    for lanes in (128, 256):
        b = out.get(f"lanes{lanes}_base", {}).get("imgs_per_sec")
        f = out.get(f"lanes{lanes}_fast_dw", {}).get("imgs_per_sec")
        if b and f:
            out[f"lanes{lanes}_fast_dw_speedup"] = round(f / b, 3)
    print("FINAL " + json.dumps(out), flush=True)
    _dump()


if __name__ == "__main__":
    main()
