#!/usr/bin/env python3
"""Round-5 serving-fold completion probe (VERDICT r04 items 4/8).

The round-4 probe measured 1 of 4 rows and then spent 2 h inside ONE
config (the folded bf16 serving graph never came back from the relay
compile) — there was no per-config watchdog. This version runs EACH config
in a fresh subprocess with a kernel-level SIGALRM self-watchdog (default
signal disposition: terminates even while blocked inside a C compile call,
the scripts/r4_tpu_waiter.py pattern), so one pathological compile costs
its timeout, not the whole probe. A timeout is itself recorded as a datum.

The fold0 baselines are already driver-captured (bench.py infer_tta /
infer_tta_bf16 stages: 14.9k fp32 / 17.6k bf16 imgs/s), so only the
fold1 rows are measured here.

Results: /tmp/r5_serving_fold.json (merged incrementally; _cpu-suffixed on
the CPU backend so smoke runs never pollute the TPU record).

Run: python3 scripts/r5_serving_fold_probe.py
Env: PROBE_IMAGES (4096), PROBE_CFG_TIMEOUT (1500 s), PROBE_COOLDOWN (120 s)
"""

import json
import os
import subprocess
import sys
import time

CONFIG_SRC = """
import json, os, signal, time
signal.alarm({timeout})  # DEFAULT disposition: kernel kill even inside C
import numpy as np
import plastic_unet_tpu  # noqa: F401 (PLASTIC_UNET_PLATFORM handling)
import jax
import jax.numpy as jnp
from plastic_unet_tpu.data.synthetic import synthetic_tiles
from plastic_unet_tpu.models import UNetPRes
from plastic_unet_tpu.ops.augment import TTA_VIEWS_2
from plastic_unet_tpu.submit.inference import predict_masks_tta
from plastic_unet_tpu.utils import enable_compilation_cache

enable_compilation_cache()
n = {n}
timgs, _ = synthetic_tiles(n, size=101, seed=1)
Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))
dtype = jnp.bfloat16 if "{dtype}" == "bf16" else None
model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                 compute_dtype=dtype, fold_hires={fold})
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 101, 101, 1)),
                    model.initial_zero_hebb(1))["params"]

@jax.jit
def run(X):
    preds = predict_masks_tta(model, params, X, transforms=TTA_VIEWS_2, chunk=128)
    return jnp.sum(preds > 0.5)

np.asarray(run(Xt))  # compile + warm
t0 = time.time()
np.asarray(run(Xt))
dt = time.time() - t0
print("RESULT " + json.dumps({{"key": "{key}", "imgs_per_sec": round(n / dt, 1)}}),
      flush=True)
"""


def out_path():
    plat = os.environ.get("PLASTIC_UNET_PLATFORM", "")
    suffix = "_cpu" if plat == "cpu" else ""
    return f"/tmp/r5_serving_fold{suffix}.json"


def main():
    n = int(os.environ.get("PROBE_IMAGES", 4096))
    cfg_timeout = int(os.environ.get("PROBE_CFG_TIMEOUT", 1500))
    cooldown = int(os.environ.get("PROBE_COOLDOWN", 120))

    out = {}
    if os.path.exists(out_path()):
        try:
            with open(out_path()) as f:
                out = json.load(f)
        except Exception:
            pass

    configs = [
        ("bf16_fold1_tta2_imgs_per_sec", "bf16", True),
        ("fp32_fold1_tta2_imgs_per_sec", "fp32", True),
    ]
    for key, dtype, fold in configs:
        if isinstance(out.get(key), (int, float)):
            print(f"skip {key}: already measured", flush=True)
            continue
        src = CONFIG_SRC.format(timeout=cfg_timeout, n=n, dtype=dtype,
                                fold=fold, key=key)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                           text=True, env=os.environ.copy())
        took = time.time() - t0
        row = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT "):
                row = json.loads(line[len("RESULT "):])
        if r.returncode == 0 and row:
            out[key] = row["imgs_per_sec"]
            print(f"{key}: {out[key]} imgs/s ({took:.0f}s)", flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["no output"]
            out[key] = f"FAILED rc={r.returncode} after {took:.0f}s: {tail[0][:200]}"
            print(f"{key}: {out[key]}", flush=True)
            # an alarm-killed config may have died mid-claim; give the relay
            # a cooldown before the next subprocess's init retries begin
            time.sleep(cooldown)
        with open(out_path(), "w") as f:
            json.dump(out, f, indent=1)
    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
