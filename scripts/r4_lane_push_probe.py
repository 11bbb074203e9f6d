#!/usr/bin/env python3
"""Round-4 lane-push sweep (VERDICT r03 item 2 follow-up): can remat_trunk
(freed HBM) and/or fold_hires (4x MXU lane utilization on the thin-channel
high-res levels) push training throughput/MFU past the 128-lane knee?

Reuses bench.bench_train verbatim (same stream construction, same timing,
same canonical-representation MFU numerator), so any winner here transplants
into bench.py as a stage with identical semantics.

Prints one JSON line per config (partial results survive a hang).
Run on the real TPU: python3 scripts/r4_lane_push_probe.py [total_imgs]
"""

import json
import sys


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

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
        with open(f"/tmp/r4_lane_push{suffix}.json", "w") as f:
            json.dump(out, f, indent=1)

    for lanes in (128, 256, 512, 1024):
        steps = max(total // lanes, 6)
        for name, kw in (
            ("base", {}),
            ("remat", {"remat_trunk": True}),
            ("fold", {"fold_hires": True}),
            ("fold_remat", {"fold_hires": True, "remat_trunk": True}),
            # (round 5: the pipe/pipe_remat variants were removed along with
            # cfg.pipelined — measured 0.68-0.69x everywhere, PERF.md; their
            # round-4 numbers live in results/r4_probes/r4_lane_push.json)
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

    print("FINAL " + json.dumps(out), flush=True)
    _dump()


if __name__ == "__main__":
    main()
