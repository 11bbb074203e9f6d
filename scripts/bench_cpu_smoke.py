#!/usr/bin/env python3
"""CPU pre-flight for bench.py: execute every REAL stage body with tiny
sizes on the CPU backend, so the official TPU record (BENCH_rNN.json) can
never die on a Python-level bug inside a stage (the round-3 record was lost
to an unguarded crash; the round-4 relay outage means new stages may never
have executed on hardware before the driver runs them).

Complements tests/test_bench_harness.py, which covers the harness wiring
with STUBBED stage bodies — this runs the real ones.

Usage:  PLASTIC_UNET_PLATFORM=cpu python3 scripts/bench_cpu_smoke.py [substr ...]
With args, only stages whose name contains one of the substrings run (the
int8 stages constant-fold pathologically slowly on CPU — a full pass can
exceed 30 min on the 1-core host, so re-runs after a bench.py edit usually
want just the touched stages).
Exit code 0 iff every selected stage body ran to completion.
"""

import importlib.util
import json
import os
import sys
import time

os.environ.setdefault("PLASTIC_UNET_PLATFORM", "cpu")

import plastic_unet_tpu  # noqa: F401  (forces the CPU backend before any device query)


def load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_cpu_smoke_target", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "cpu", "smoke must not claim the TPU relay"
    bench = load_bench()

    # (name, thunk) — tiny sizes: the goal is code-path execution, not timing.
    stages = [
        ("bench_train_b1", lambda: bench.bench_train(lanes=1, steps=4, patch_conv=32)),
        ("bench_train_lanes_bf16", lambda: bench.bench_train(
            lanes=2, steps=4, compute_dtype=jnp.bfloat16)),
        ("bench_train_fold_remat", lambda: bench.bench_train(
            lanes=2, steps=4, compute_dtype=jnp.bfloat16, fold_hires=True, remat_trunk=True)),
        ("bench_train_coordconv", lambda: bench.bench_train(lanes=2, steps=4, coord_conv=True)),
        ("bench_vanilla_forward", lambda: bench.bench_vanilla_forward(32)),
        ("bench_oja_epoch_with_eval", lambda: bench.bench_oja_epoch_with_eval(16)),
        ("bench_infer_tta", lambda: bench.bench_infer_tta(256)),
        ("bench_infer_tta8_bf16", lambda: bench.bench_infer_tta(
            256, compute_dtype=jnp.bfloat16,
            transforms=__import__("plastic_unet_tpu.ops.augment", fromlist=["TTA_VIEWS_8"]).TTA_VIEWS_8)),
        ("bench_infer_tta_int8", lambda: bench.bench_infer_tta(
            256, compute_dtype=jnp.bfloat16, quant=True)),
        ("bench_artifact_serving", lambda: bench.bench_artifact_serving(256)),
        ("bench_submission_scale", lambda: bench.bench_submission_scale(300)),
        ("bench_submission_scale_int8", lambda: bench.bench_submission_scale(300, quant=True)),
        ("bench_infer_tta8_int8", lambda: bench.bench_infer_tta(
            256, compute_dtype=jnp.bfloat16, quant=True,
            transforms=__import__("plastic_unet_tpu.ops.augment", fromlist=["TTA_VIEWS_8"]).TTA_VIEWS_8)),
        ("bench_e2e_tuned_run", lambda: bench.bench_e2e_tuned_run(
            train_samples=16, epochs=1, n_test=64)),
    ]

    if len(sys.argv) > 1:
        want = sys.argv[1:]
        stages = [(n, t) for (n, t) in stages if any(w in n for w in want)]
        print(f"selected {len(stages)} stage(s): {[n for n, _ in stages]}", flush=True)

    failures = {}
    for name, thunk in stages:
        t0 = time.time()
        try:
            r = thunk()
            print(f"OK   {name} ({time.time() - t0:.1f}s) -> {r}", flush=True)
        except Exception as e:  # noqa: BLE001 — report every stage, then fail
            failures[name] = f"{type(e).__name__}: {e}"
            print(f"FAIL {name} ({time.time() - t0:.1f}s): {failures[name]}", flush=True)

    print(json.dumps({"failures": failures}), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
