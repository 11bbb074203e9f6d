#!/usr/bin/env python3
"""Benchmark: TGS-Salt images/sec/chip on the flagship config.

Measures (on whatever accelerator jax.devices()[0] is — the real TPU chip
under the driver):
  * train: the scan-based lifetime training loop in reference-parity mode
    (B=1 stream, per-sample Adam+StepLR, hebb carry) on 101x101 tiles,
    UNetPRes(neurons=16, rule=hebb) — the exact semantics of the reference's
    hot loop (train.py:91-112). This is the headline metric.
  * train (lane mode): 8 parallel lifetime streams (throughput extension).
  * infer+TTA: batched zero-trace inference with identity+hflip TTA merge.

Timing note: device->host transfers (np.asarray) are used as sync points —
block_until_ready alone does not reliably wait through the axon relay.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline compares against the self-measured reference throughput in
bench_baseline.json (the reference publishes no numbers, BASELINE.md).
"""

import json
import os
import time

import numpy as np


def _sync(x):
    """Force completion by pulling a value to host."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf)


# TPU v5e (lite) peak: 197 TFLOP/s bf16. MFU for fp32 configs is reported
# against the same number (conservative: the MXU's fp32 path is slower).
_V5E_PEAK_FLOPS = 197e12


class _CacheProbe:
    """Answers 'did the headline graph come from the persistent XLA cache?'
    (VERDICT r02 weak #2: BENCH must carry machine-readable evidence so a
    slow compile_seconds is attributable to the relay session, not the code.)
    A compile that MISSES the local cache writes a new entry file; a HIT
    writes nothing — so snapshot the cache dir around the first dispatch."""

    def __init__(self):
        import jax

        self.dir = jax.config.jax_compilation_cache_dir
        self.before = self._entries()

    def _entries(self):
        try:
            return set(os.listdir(self.dir)) if self.dir else set()
        except OSError:
            return set()

    def hit(self) -> bool | None:
        if not self.dir:
            return None
        return not (self._entries() - self.before)


def bench_train(lanes: int, steps: int, compute_dtype=None, rule: str = "hebb", coord_conv: bool = False,
                patch_conv: int = 0):
    """Returns (imgs_per_sec, compile_seconds, mfu_or_None).

    patch_conv=32 is the measured-best B=1 parity configuration (im2col-
    forward thin-level convs, ops/patch_conv): same math as the reference
    step, matmul-ordered fp32 accumulation, torch-trajectory parity tested
    (tests/test_train_loop.py::test_training_trajectory_matches_torch
    [hebb-patch_conv])."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule=rule,
                     compute_dtype=compute_dtype, coord_conv=coord_conv, patch_conv=patch_conv)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=lanes)

    n = steps * lanes
    base = min(n, 512)
    imgs, masks = synthetic_tiles(base, size=101, seed=0)
    reps = -(-n // base)
    imgs = np.tile(imgs, (reps, 1, 1, 1))[:n]
    masks = np.tile(masks, (reps, 1, 1, 1))[:n]
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=lanes)

    epoch_fn = make_epoch_fn(model, tx, loss_space="logits", donate=False)
    rng = jax.random.PRNGKey(1)

    # XLA's own FLOP count of ONE training step (for MFU). Analyzed on a
    # standalone-jitted step: cost_analysis of the scanned epoch counts the
    # while-loop body only once for long loops, so per-epoch analysis would
    # undercount by the trip count.
    epoch_flops = None
    try:
        from plastic_unet_tpu.train.loop import make_train_step

        step_fn = jax.jit(make_train_step(model, tx, loss_space="logits"))
        ca = step_fn.lower(state, (Xl[0], Yl[0]), rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        epoch_flops = float(ca["flops"]) * steps
    except Exception:
        pass

    t0 = time.time()
    s, losses = epoch_fn(state, Xl, Yl, rng)
    _sync(losses)
    compile_s = time.time() - t0

    t0 = time.time()
    s, losses = epoch_fn(s, Xl, Yl, rng)
    _sync(losses)
    dt = time.time() - t0
    mfu = (epoch_flops / dt / _V5E_PEAK_FLOPS) if epoch_flops else None
    return n / dt, compile_s, mfu


def bench_vanilla_forward(n_infer: int):
    """BASELINE.json config #1: vanilla U-Net (no plasticity) forward
    inference on a 101x101 tile batch."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, plastic=False)
    x0 = jnp.zeros((1, 101, 101, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]
    # floor to a multiple of the chunk size (BENCH_INFER_SAMPLES need not
    # divide 128; predict_masks pads instead, but here an exact count keeps
    # the imgs/s denominator honest)
    n_infer = max(128, (n_infer // 128) * 128)
    timgs, _ = synthetic_tiles(n_infer, size=101, seed=2)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    @jax.jit
    def run(Xt):
        def chunk(x):
            out = model.apply({"params": params}, x, model.initial_zero_hebb(x.shape[0]), train=False)
            return out.activout
        nc = Xt.shape[0] // 128
        preds = jax.lax.map(chunk, Xt.reshape(nc, 128, 101, 101, 1))
        return jnp.sum(preds > 0.5)

    _sync(run(Xt))
    t0 = time.time()
    _sync(run(Xt))
    return n_infer / (time.time() - t0)


def bench_oja_epoch_with_eval(steps: int):
    """BASELINE.json config #3: Oja rule, full train epoch with BCE loss +
    IoU eval afterwards."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.eval.evaluate import eval_net
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule="oja", patch_conv=32)
    tx = adam_step_lr(3e-4, 0.666, 1e5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (101, 101, 1), lanes=1)
    imgs, masks = synthetic_tiles(steps, size=101, seed=3)
    X = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
    Y = jnp.asarray(masks[:, 0])
    Xl, Yl = reshape_stream(X, Y, lanes=1)
    epoch_fn = make_epoch_fn(model, tx, donate=False)
    rng = jax.random.PRNGKey(1)
    s, losses = epoch_fn(state, Xl, Yl, rng)
    _sync(losses)
    vimgs = np.transpose(imgs[:64], (0, 2, 3, 1))
    eval_net(model, s.params, vimgs, masks[:64])  # warm eval path
    t0 = time.time()
    s, losses = epoch_fn(s, Xl, Yl, rng)
    _sync(losses)
    eval_net(model, s.params, vimgs, masks[:64])
    return steps / (time.time() - t0)


def bench_infer_tta(n_infer: int, compute_dtype=None, transforms=("identity", "hflip"),
                    batch_views: bool = False):
    import jax.numpy as jnp

    import jax

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.inference import predict_masks_tta

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, compute_dtype=compute_dtype)
    x0 = jnp.zeros((1, 101, 101, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]

    timgs, _ = synthetic_tiles(n_infer, size=101, seed=1)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    @jax.jit
    def run(Xt):
        # full TTA inference + thresholding on device; scalar checksum so the
        # timing measures compute, not the bench relay's host readback
        preds = predict_masks_tta(model, params, Xt, transforms=transforms, chunk=128,
                                  batch_views=batch_views)
        return jnp.sum(preds > 0.5)

    # XLA's FLOP count of one 128-image forward chunk, for serving MFU
    # (T TTA views => T chunk-forwards per 128 images).
    chunk_flops = None
    try:
        from plastic_unet_tpu.eval.evaluate import _forward_chunk

        xc = jnp.zeros((128, 101, 101, 1))
        ca = jax.jit(lambda p, x: _forward_chunk(model, p, x)).lower(params, xc).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        chunk_flops = float(ca["flops"])
    except Exception:
        pass

    _sync(run(Xt))
    t0 = time.time()
    _sync(run(Xt))
    dt = time.time() - t0
    nv = len(transforms)
    mfu = (chunk_flops * nv * (n_infer / 128) / dt / _V5E_PEAK_FLOPS) if chunk_flops else None
    return n_infer / dt, mfu


def bench_artifact_serving(n_infer: int):
    """Deployment-path serving: export the flagship bf16 2-view-TTA serving
    graph to a StableHLO artifact (submit/export.py), reload it, and time
    chunked numpy-in/numpy-out predict — the number a `plastic-unet-export`
    bundle actually serves at. Unlike the on-device bench_infer_tta, every
    chunk pays host staging + relay readback, so the gap to
    infer_tta_bf16_images_per_sec bounds the deployment tax."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.export import export_predictor, load_predictor

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     compute_dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 101, 101, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]
    timgs, _ = synthetic_tiles(n_infer, size=101, seed=3)
    X = np.ascontiguousarray(np.transpose(timgs, (0, 2, 3, 1)).astype(np.float32))
    td = tempfile.mkdtemp(prefix="bench_artifact_")
    try:
        path = export_predictor(model, params, td + "/art", chunk=128,
                                tta=("identity", "hflip"))
        pred = load_predictor(path).warmup()
        pred.predict(X[:256])  # warm the chunked-predict loop
        t0 = time.time()
        out = pred.predict(X)
        dt = time.time() - t0
        assert out.shape[0] == n_infer
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return n_infer / dt


def bench_e2e_tuned_run(train_samples: int, epochs: int, n_test: int):
    """BASELINE.json config #5 as ONE measured number (VERDICT r02 item 4):
    the tuned_run-shaped pipeline — augmented+shuffled training through the
    real driver (checkpoints included), best-threshold search on validation,
    4-view TTA inference, RLE submission CSV — timed end-to-end on the warm
    second pass. Reference anchor: unet_p_res_script.py:1036-1135.

    Returns (images_per_sec, seconds) where the image count is every image
    processed: epochs*train_samples train steps + n_test TTA-inferred tiles.
    """
    import contextlib
    import io
    import shutil
    import tempfile

    import pandas as pd

    from plastic_unet_tpu.config import TrainConfig
    from plastic_unet_tpu.data.synthetic import synthetic_split, synthetic_tiles
    from plastic_unet_tpu.submit.inference import start_inference
    from plastic_unet_tpu.train.driver import start_train

    n_val = max(train_samples // 8, 16)
    x_train, x_valid, y_train, y_valid = synthetic_split(train_samples, n_val, size=101, seed=21)
    timgs, _ = synthetic_tiles(n_test, size=101, seed=22)
    test_df = pd.DataFrame(index=[f"bench{i}" for i in range(n_test)])
    test_df["images"] = [t[0] for t in timgs]

    def run_once():
        out_dir = tempfile.mkdtemp(prefix="bench_e2e_")
        try:
            cfg = TrainConfig(
                out_dir=out_dir, epochs=epochs, lr=3e-4, steplr=1e4, prule="hebb",
                neurons=8, im_width=101, im_height=101, im_chan=1,
                val_every=max(epochs, 1), save_every=max(epochs, 1),
                augment=True, shuffle=True, patch_conv=32, debug=False,
            )
            with contextlib.redirect_stdout(io.StringIO()):
                result = start_train(x_train, x_valid, y_train, y_valid, cfg)
                start_inference(
                    result.model, result.state.params, test_df, x_valid, y_valid,
                    out_dir=out_dir, img_width=101, img_height=101, img_chan=1,
                    tta=("identity", "hflip", "vflip", "rot180"),
                )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    run_once()  # compile/warm every stage
    t0 = time.time()
    run_once()
    dt = time.time() - t0
    return (epochs * train_samples + n_test) / dt, dt


def _watchdog(seconds: int):
    """The TPU relay in this environment occasionally wedges (see PERF.md);
    emit an honest failure record instead of hanging the whole round."""
    import signal

    def on_timeout(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "TGS-Salt train images/sec/chip (reference-parity lifetime loop, UNetPRes nbf=101)",
                    "value": 0,
                    "unit": "images/sec",
                    "vs_baseline": 0,
                    "error": f"bench watchdog fired after {seconds}s (TPU relay unresponsive)",
                }
            ),
            flush=True,
        )
        os._exit(2)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(seconds)


def main():
    # 3600: the relay backend's server-side executable compile/load for the
    # big epoch graphs was measured at 230-570 s per graph depending on
    # session (PERF.md compile-cache section) — a 1200 s watchdog could fire
    # on a slow-but-healthy session. The watchdog guards hangs, not slowness.
    _watchdog(int(os.environ.get("BENCH_WATCHDOG_SECS", 3600)))

    import jax

    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    # Headline at the real TGS epoch scale (3,200 train samples/epoch) so
    # per-dispatch/readback overhead is amortized the way a real run would be.
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", 3200))
    # 4096: steady-state serving scale (the TGS test set is 18k tiles) — at
    # 512 the ~30 ms relay readback was ~half the measured time.
    n_infer = int(os.environ.get("BENCH_INFER_SAMPLES", 4096))

    import jax.numpy as jnp

    cache_probe = _CacheProbe()
    train_ips, compile_s, train_mfu = bench_train(lanes=1, steps=steps, patch_conv=32)
    headline_cache_hit = cache_probe.hit()
    train_plain_ips, _, _ = bench_train(lanes=1, steps=max(steps // 4, 256))
    # B=1 throughput mode: bf16 trunk + im2col-forward convs (round 3 — the
    # measured-best single-stream configuration; fp32 patch_conv=32 above
    # remains the reference-precision headline)
    train_b1_bf16_ips, _, _ = bench_train(lanes=1, steps=max(steps // 2, 256),
                                          compute_dtype=jnp.bfloat16, patch_conv=32)
    lane_ips, _, _ = bench_train(lanes=8, steps=max(steps // 32, 32))
    lane_bf16_ips, _, _ = bench_train(lanes=8, steps=max(steps // 32, 32), compute_dtype=jnp.bfloat16)
    max_tp_ips, compile_128_s, max_tp_mfu = bench_train(lanes=128, steps=12, compute_dtype=jnp.bfloat16)
    try:
        tp256_ips, _, tp256_mfu = bench_train(lanes=256, steps=8, compute_dtype=jnp.bfloat16)
    except Exception:
        tp256_ips, tp256_mfu = None, None  # e.g. OOM at 256 lanes
    infer_ips, infer_mfu = bench_infer_tta(n_infer)
    infer_bf16_ips, infer_bf16_mfu = bench_infer_tta(n_infer, compute_dtype=jnp.bfloat16)
    # full dihedral group (8 views) — VERDICT r02 item 5's serving point
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_8

    infer_tta8_ips, infer_tta8_mfu = bench_infer_tta(n_infer, compute_dtype=jnp.bfloat16,
                                                     transforms=TTA_VIEWS_8)
    artifact_ips, artifact_error = None, None
    try:
        artifact_ips = bench_artifact_serving(min(n_infer, 2048))
    except Exception as e:
        artifact_error = f"{type(e).__name__}: {e}"
    vanilla_ips = bench_vanilla_forward(min(n_infer, 256))
    oja_ips = bench_oja_epoch_with_eval(min(max(steps // 2, 64), 512))
    coord_ips, _, _ = bench_train(lanes=8, steps=32, coord_conv=True)
    e2e_error = None
    try:
        e2e_ips, e2e_secs = bench_e2e_tuned_run(
            train_samples=int(os.environ.get("BENCH_E2E_TRAIN_SAMPLES", 512)),
            epochs=int(os.environ.get("BENCH_E2E_EPOCHS", 2)),
            n_test=int(os.environ.get("BENCH_E2E_TEST_SAMPLES", 1024)),
        )
    except Exception as e:  # honest-failure record, like the watchdog's
        e2e_ips, e2e_secs = None, None
        e2e_error = f"{type(e).__name__}: {e}"

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")) as f:
            baseline = json.load(f)
    except Exception:
        pass
    base_train = baseline.get("train_images_per_sec") if baseline else None

    result = {
        "metric": "TGS-Salt train images/sec/chip (reference-parity lifetime loop, UNetPRes nbf=101)",
        "value": round(train_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(train_ips / base_train, 1) if base_train else None,
        "train_parity_plain_xla_images_per_sec": round(train_plain_ips, 1),
        "train_b1_bf16_patch_images_per_sec": round(train_b1_bf16_ips, 1),
        "train_8lane_images_per_sec": round(lane_ips, 1),
        "train_8lane_bf16_images_per_sec": round(lane_bf16_ips, 1),
        "train_128lane_bf16_images_per_sec": round(max_tp_ips, 1),
        "train_256lane_bf16_images_per_sec": round(tp256_ips, 1) if tp256_ips else None,
        "infer_tta_images_per_sec": round(infer_ips, 1),
        "infer_tta_bf16_images_per_sec": round(infer_bf16_ips, 1),
        "infer_tta8_bf16_images_per_sec": round(infer_tta8_ips, 1),
        "e2e_tuned_run_images_per_sec": round(e2e_ips, 1) if e2e_ips else None,
        "e2e_tuned_run_seconds": round(e2e_secs, 1) if e2e_secs else None,
        "e2e_tuned_run_error": e2e_error,
        "artifact_infer_bf16_images_per_sec": round(artifact_ips, 1) if artifact_ips else None,
        "artifact_infer_error": artifact_error,
        "vanilla_forward_images_per_sec": round(vanilla_ips, 1),
        "oja_epoch_with_eval_images_per_sec": round(oja_ips, 1),
        "coordconv_plastic_train_images_per_sec": round(coord_ips, 1),
        "infer_vs_baseline": round(infer_ips / baseline["infer_images_per_sec"], 1) if baseline else None,
        "mfu_infer_tta": round(infer_mfu, 4) if infer_mfu else None,
        "mfu_infer_tta_bf16": round(infer_bf16_mfu, 4) if infer_bf16_mfu else None,
        "mfu_infer_tta8_bf16": round(infer_tta8_mfu, 4) if infer_tta8_mfu else None,
        "mfu_parity_mode": round(train_mfu, 4) if train_mfu else None,
        "mfu_128lane_bf16": round(max_tp_mfu, 4) if max_tp_mfu else None,
        "mfu_256lane_bf16": round(tp256_mfu, 4) if tp256_mfu else None,
        "mfu_peak_ref_tflops": 197,
        "compile_seconds": round(compile_s, 1),
        "compile_seconds_128lane": round(compile_128_s, 1),
        # True when the headline graphs came from the persistent local XLA
        # cache (no new cache entries written) — compile_seconds is then the
        # relay backend's server-side executable load, a property of the
        # relay session, not of this code (PERF.md compile-cache section:
        # a verified local-cache HIT has measured 5-570 s across sessions).
        "compile_cache_hit": headline_cache_hit,
        "relay_session_note": (
            "first-call latency through the axon relay includes server-side "
            "executable load that the local XLA cache cannot skip; see PERF.md"
        ),
        "device": str(dev),
        "baseline_source": baseline.get("hardware") if baseline else "none",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
