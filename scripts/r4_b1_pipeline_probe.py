#!/usr/bin/env python3
"""ARCHIVAL (round 4; no longer runnable): the pipelined mode it measured
was removed in round 5 after measuring 0.68-0.69x in every regime — this
script is kept only as provenance for results/r4_probes/r4_b1_pipeline.json.

Round-4 measurement of the pipelined (delayed-gradient) B=1 mode
(then train/pipelined.py) — the constructive counterpart of the slack probe:
instead of a ghost forward, this measures the REAL proposed transformation
(stale-by-one params; the next forward and the pending backward+Adam are
independent subgraphs XLA may interleave).

Reuses bench.bench_train verbatim (same stream/timing/MFU semantics) so the
numbers are directly comparable to every other train config in BENCH_rNN.

Prints one JSON line per config (incremental /tmp writes survive a hang).
Run on the real TPU: python3 scripts/r4_b1_pipeline_probe.py [steps]
"""

import json
import sys


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import jax
    import jax.numpy as jnp

    import bench
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    out = {}

    def _dump():
        # Incremental write: a stage timeout must not lose already-measured
        # numbers (r4_fill_perf.py reads this file). CPU smoke runs write to
        # a _cpu-suffixed path so they never pollute the TPU record.
        suffix = "_cpu" if jax.default_backend() == "cpu" else ""
        with open(f"/tmp/r4_b1_pipeline{suffix}.json", "w") as f:
            json.dump(out, f, indent=1)

    for name, kw in (
        ("fp32_patch_base", {"patch_conv": 32}),
        ("fp32_patch_pipelined", {"patch_conv": 32, "pipelined": True}),
        ("bf16_patch_base", {"patch_conv": 32, "compute_dtype": jnp.bfloat16}),
        ("bf16_patch_pipelined", {"patch_conv": 32, "compute_dtype": jnp.bfloat16,
                                  "pipelined": True}),
    ):
        try:
            ips, compile_s, mfu = bench.bench_train(1, steps, **kw)
            out[name] = {
                "imgs_per_sec": round(ips, 1),
                "mfu": round(mfu, 4) if mfu else None,
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({name: out[name]}), flush=True)
        _dump()

    for pre in ("fp32_patch", "bf16_patch"):
        b, p = out.get(f"{pre}_base", {}), out.get(f"{pre}_pipelined", {})
        if "imgs_per_sec" in b and "imgs_per_sec" in p:
            out[f"{pre}_speedup"] = round(p["imgs_per_sec"] / b["imgs_per_sec"], 3)
    print("FINAL " + json.dumps(out), flush=True)
    _dump()


if __name__ == "__main__":
    main()
