#!/usr/bin/env python3
"""Fill in the lane-scaling curve between the benched 8 and 128 points
(bf16 trunk, same config as bench.bench_train)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from bench import bench_train
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    for lanes in (16, 32, 64):
        ips, _, mfu = bench_train(lanes=lanes, steps=24, compute_dtype=jnp.bfloat16)
        out[f"lanes{lanes}_bf16_imgs_per_sec"] = round(ips, 1)
        out[f"lanes{lanes}_bf16_mfu"] = round(mfu, 4) if mfu else None
        print(json.dumps({f"lanes{lanes}": round(ips, 1), "mfu": out[f"lanes{lanes}_bf16_mfu"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
