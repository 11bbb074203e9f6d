"""The official bench record must be unkillable (VERDICT r03 item 1): any
stage failure is recorded per-key and never fatal, backend init retries
through the relay wedge window with backoff, and _emit always prints one
parseable JSON line containing whatever was measured before a crash."""

import importlib.util
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    """A fresh bench module per test (it carries process-global accumulators),
    with the partial-results checkpoint pointed at a throwaway path."""
    spec = importlib.util.spec_from_file_location("bench_under_test", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stage_failure_is_recorded_not_fatal(bench, tmp_path, capsys):
    bench._PARTIAL_PATH = str(tmp_path / "partial.json")

    def boom():
        raise RuntimeError("synthetic stage failure")

    assert bench._stage("broken_stage", boom) is None
    assert "broken_stage" in bench._ERRORS
    assert "RuntimeError" in bench._ERRORS["broken_stage"]
    # a later stage still runs and records
    assert bench._stage("ok_stage", lambda: 42.0) == 42.0


def test_emit_contains_partials_and_error(bench, tmp_path, capsys):
    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    bench._put("train_images_per_sec", 1234.5)
    bench._put("infer_tta_images_per_sec", 999.9)
    bench._ERRORS["late_stage"] = "RuntimeError: died late"
    bench._emit(error="synthetic crash")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)  # MUST be one parseable JSON line
    assert rec["value"] == 1234.5  # early numbers survive a late crash
    assert rec["infer_tta_images_per_sec"] == 999.9
    assert rec["error"] == "synthetic crash"
    assert rec["errors"]["late_stage"].startswith("RuntimeError")
    assert rec["unit"] == "images/sec"
    assert "mfu_denominator_note" in rec  # VERDICT r03 weak #5
    # vs_baseline computed from the partial headline when a baseline exists
    assert rec["vs_baseline"] is not None

    # checkpoint file carries the same partial state
    with open(bench._PARTIAL_PATH) as f:
        part = json.load(f)
    assert part["results"]["train_images_per_sec"] == 1234.5


def test_emit_without_headline_is_honest_failure(bench, tmp_path, capsys):
    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    bench._emit(error="backend never came up")
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 0
    assert rec["vs_baseline"] == 0
    assert rec["error"] == "backend never came up"


def test_emit_prints_exactly_once(bench, tmp_path, capsys):
    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    bench._emit()
    bench._emit(error="watchdog fired during the success print")
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1


def test_devices_with_retry_recovers(bench, monkeypatch):
    """Backend init failing transiently (the BENCH_r03 failure mode) must be
    retried with backoff, then succeed and record the retry count."""
    import jax

    calls = {"n": 0}

    def flaky_devices():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Unable to initialize backend 'axon'")
        return ["FAKE_DEVICE"]

    monkeypatch.setattr(jax, "devices", flaky_devices)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # no real waiting
    devs = bench._devices_with_retry(max_wait=600)
    assert devs == ["FAKE_DEVICE"]
    assert calls["n"] == 3
    assert bench._RESULTS["backend_init_retries"] == 2


def test_devices_with_retry_gives_up_after_window(bench, monkeypatch):
    import jax

    def always_fails():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(jax, "devices", always_fails)
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: clock["t"])

    def fake_sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    with pytest.raises(RuntimeError, match="backend init failed after"):
        bench._devices_with_retry(max_wait=200)
    assert clock["t"] >= 200 - 120  # slept through most of the window


def test_main_emits_json_on_crash(bench, monkeypatch, tmp_path, capsys):
    """A crash anywhere inside the run must still produce the one-line JSON
    record (BENCH_r03 was a raw traceback with no record) and exit rc=1."""
    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    monkeypatch.setattr(bench, "_watchdog", lambda s: None)

    def run_then_die():
        bench._put("train_images_per_sec", 777.0)
        raise ValueError("synthetic mid-run crash")

    monkeypatch.setattr(bench, "_run", run_then_die)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 777.0  # measured-before-crash number kept
    assert "synthetic mid-run crash" in rec["error"]


def test_sigterm_emits_partial_record(bench, monkeypatch, tmp_path, capsys):
    """Round 4's driver kill (external `timeout` -> SIGTERM) produced NO
    JSON at all; the handler must emit the partial record and exit 2."""
    import signal

    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    bench._put("train_images_per_sec", 555.0)
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    bench._install_sigterm_handler()
    handler = signal.getsignal(signal.SIGTERM)
    handler(signal.SIGTERM, None)
    assert exits == [2]
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 555.0
    assert "SIGTERM" in rec["error"]
    signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_watchdog_clamped_to_absolute_deadline(bench, monkeypatch):
    """ADVICE r04 medium: re-arming after a slow init must NOT extend the
    alarm past the absolute deadline."""
    import signal
    import time as _time

    armed = []
    monkeypatch.setattr(signal, "alarm", lambda s: armed.append(s))
    bench._DEADLINE = _time.time() + 100
    bench._watchdog(3600)  # full re-arm request
    assert 60 <= armed[-1] <= 101  # clamped to remaining, floored at 60
    bench._DEADLINE = None
    bench._watchdog(1234)  # no deadline (test-driven stages): verbatim
    assert armed[-1] == 1234
    signal.signal(signal.SIGALRM, signal.SIG_DFL)


def test_stage_budgeted_skips_near_deadline(bench, tmp_path):
    import time as _time

    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    bench._DEADLINE = _time.time() + 5  # < _STAGE_MIN_SECS
    assert bench._stage_budgeted("late_stage", lambda: 1.0) is None
    assert bench._ERRORS["late_stage"].startswith("skipped:")
    bench._DEADLINE = None  # no deadline -> runs normally
    assert bench._stage_budgeted("ok_stage", lambda: 2.0) == 2.0
    assert "ok_stage" not in bench._ERRORS


def test_run_wiring_all_keys(bench, monkeypatch, tmp_path):
    """Drive _run() with every measurement stubbed: all result keys must be
    wired to the right stage outputs (guards tuple-unpack/key-name drift
    after the incremental-accumulation restructure)."""
    bench._PARTIAL_PATH = str(tmp_path / "partial.json")
    monkeypatch.setattr(bench, "_watchdog", lambda s: None)
    monkeypatch.setattr(bench, "_devices_with_retry", lambda w: ["FAKE_DEV"])
    monkeypatch.setattr(bench, "_CacheProbe", lambda: type("P", (), {"hit": lambda s: True})())
    monkeypatch.setattr(
        bench, "bench_train",
        lambda lanes, steps, compute_dtype=None, rule="hebb", coord_conv=False, patch_conv=0,
        fold_hires=False, remat_trunk=False, fast_dw=False:
            (100.0 * lanes, 2.0, 0.25),
    )
    monkeypatch.setattr(bench, "bench_infer_tta",
                        lambda n, compute_dtype=None, transforms=("identity", "hflip"),
                        batch_views=False, quant=False: (5000.0, 0.3))
    monkeypatch.setattr(bench, "bench_artifact_serving", lambda n: 4000.0)
    monkeypatch.setattr(bench, "bench_submission_scale",
                        lambda n, quant=False: (3000.0, n / 3000.0))
    monkeypatch.setattr(bench, "bench_vanilla_forward", lambda n: 9000.0)
    monkeypatch.setattr(bench, "bench_oja_epoch_with_eval", lambda n: 800.0)
    monkeypatch.setattr(bench, "bench_e2e_tuned_run",
                        lambda train_samples, epochs, n_test: (200.0, 9.0))
    monkeypatch.setenv("BENCH_SUBMISSION_TILES", "18000")
    bench._run()
    expect = {
        "device", "train_images_per_sec", "compile_seconds", "mfu_parity_mode",
        "compile_cache_hit", "train_parity_plain_xla_images_per_sec",
        "train_b1_bf16_patch_images_per_sec",
        "train_8lane_images_per_sec",
        "train_8lane_bf16_images_per_sec", "train_128lane_bf16_images_per_sec",
        "train_128lane_bf16_fast_dw_images_per_sec", "mfu_128lane_bf16_fast_dw",
        "compile_seconds_128lane", "mfu_128lane_bf16",
        "train_256lane_bf16_images_per_sec", "mfu_256lane_bf16",
        "infer_tta_images_per_sec", "mfu_infer_tta",
        "infer_tta_bf16_images_per_sec", "mfu_infer_tta_bf16",
        "infer_tta8_bf16_images_per_sec", "mfu_infer_tta8_bf16",
        "infer_tta8_int8_images_per_sec", "mfu_infer_tta8_int8",
        "infer_tta_int8_images_per_sec", "mfu_infer_tta_int8",
        "artifact_infer_bf16_images_per_sec",
        "submission_18k_images_per_sec", "submission_18k_seconds",
        "submission_18k_int8_images_per_sec", "submission_18k_int8_seconds",
        "submission_tiles", "vanilla_forward_images_per_sec",
        "oja_epoch_with_eval_images_per_sec",
        "coordconv_plastic_train_images_per_sec",
        "e2e_tuned_run_images_per_sec", "e2e_tuned_run_seconds",
    }
    missing = expect - set(bench._RESULTS)
    assert not missing, f"unwired result keys: {sorted(missing)}"
    assert not bench._ERRORS, bench._ERRORS
    assert bench._RESULTS["submission_18k_seconds"] == 6.0
