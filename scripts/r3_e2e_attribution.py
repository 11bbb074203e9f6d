#!/usr/bin/env python3
"""Attribute the e2e tuned-run pipeline's wall clock (bench_e2e_tuned_run
measured 13.1 s warm for ~1 s of device compute): how much is train dispatch
vs checkpoint IO vs eval vs threshold search vs TTA inference vs re-tracing.
Monkeypatch-wraps the driver's stage functions with timers; runs the
pipeline twice (cold incl. compile, warm) and prints per-stage seconds.
"""

import contextlib
import io
import json
import os
import shutil
import tempfile
import time

import numpy as np

TIMERS = {}


def wrap(mod, name, key):
    real = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.time()
        out = real(*a, **kw)
        TIMERS[key] = TIMERS.get(key, 0.0) + (time.time() - t0)
        return out

    setattr(mod, name, timed)


def main():
    import pandas as pd

    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split, synthetic_tiles
    import importlib

    inf_mod = importlib.import_module("plastic_unet_tpu.submit.inference")
    from plastic_unet_tpu.train import driver as drv
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    wrap(drv, "save_reference_artifacts", "checkpoint_reference_artifacts")
    wrap(drv, "orbax_save", "checkpoint_orbax")
    wrap(drv, "eval_net", "validation_eval")
    wrap(inf_mod, "score_model_best_iou", "threshold_search")
    wrap(inf_mod, "predict_masks_tta", "tta_inference")
    wrap(inf_mod, "encode_batch", "rle_encode")

    train_samples, epochs, n_test = 512, 2, 1024
    n_val = 64
    x_train, x_valid, y_train, y_valid = synthetic_split(train_samples, n_val, size=101, seed=21)
    timgs, _ = synthetic_tiles(n_test, size=101, seed=22)
    test_df = pd.DataFrame(index=[f"bench{i}" for i in range(n_test)])
    test_df["images"] = [t[0] for t in timgs]

    for run in ("cold", "warm"):
        TIMERS.clear()
        out_dir = tempfile.mkdtemp(prefix="e2e_attr_")
        t0 = time.time()
        cfg = TrainConfig(
            out_dir=out_dir, epochs=epochs, lr=3e-4, steplr=1e4, prule="hebb",
            neurons=8, im_width=101, im_height=101, im_chan=1,
            val_every=epochs, save_every=epochs,
            augment=True, shuffle=True, patch_conv=32, debug=False,
        )
        with contextlib.redirect_stdout(io.StringIO()):
            t_tr0 = time.time()
            result = drv.start_train(x_train, x_valid, y_train, y_valid, cfg)
            t_train = time.time() - t_tr0
            t_inf0 = time.time()
            inf_mod.start_inference(
                result.model, result.state.params, test_df, x_valid, y_valid,
                out_dir=out_dir, img_width=101, img_height=101, img_chan=1,
                tta=("identity", "hflip", "vflip", "rot180"),
            )
            t_infer = time.time() - t_inf0
        total = time.time() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        report = {
            "run": run, "total_s": round(total, 2),
            "start_train_s": round(t_train, 2),
            "start_inference_s": round(t_infer, 2),
        }
        report.update({k: round(v, 2) for k, v in sorted(TIMERS.items())})
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
