"""scripts/r4_fill_perf.py — the probe-JSON -> PERF.md splicer that commits
TPU probe results automatically (the round-4 pipeline calls it after every
probe). Pin the properties a bad splice would silently destroy: a generated
block must stop at the NEXT heading of any level (## or ###), re-splicing
must be idempotent, and every renderer must tolerate partial/error inputs
(probes write incrementally; a stage timeout leaves partial JSON)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fill():
    spec = importlib.util.spec_from_file_location(
        "r4_fill_perf_under_test", os.path.join(REPO, "scripts", "r4_fill_perf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _perf_text():
    with open(os.path.join(REPO, "PERF.md")) as f:
        return f.read()


LANE = {
    "full": {"us_per_step": 1000.0, "imgs_per_sec": 128000.0},
    "fwd_only": {"us_per_step": 300.0, "imgs_per_sec": 0.0},
    "remat_trunk": {"error": "boom"},
    "cost_analysis": {
        "step_gflops": 50.0,
        "step_gbytes": 1.5,
        "arithmetic_intensity_flops_per_byte": 33.0,
        "mfu_at_197tflops": 0.26,
        "hbm_util_at_819gbs": 0.9,
    },
}


def test_lane_splice_stops_at_subsection_headings():
    fp = _fill()
    text = _perf_text()
    out = fp.splice(text, fp.LANE_TAG, fp.render_lane(LANE))
    # the ### sections that FOLLOW the lane tag must survive the splice
    assert "### Round-4 TPU availability log" in out
    assert "### remat_trunk: the HBM" in out
    assert "| full | 1000 | 128000 |" in out
    assert "FAILED: boom" in out


def test_resplice_is_idempotent():
    fp = _fill()
    once = fp.splice(_perf_text(), fp.LANE_TAG, fp.render_lane(LANE))
    twice = fp.splice(once, fp.LANE_TAG, fp.render_lane(LANE))
    assert once == twice


def test_all_tags_present_in_perf():
    fp = _fill()
    text = _perf_text()
    for tag in (fp.SLACK_TAG, fp.LANE_TAG, fp.PIPELINE_TAG, fp.LANEPUSH_TAG,
                fp.SERVINGFOLD_TAG, fp.QUANT_TAG):
        assert tag in text, f"PERF.md placeholder missing: {tag}"


def test_renderers_tolerate_partial_and_error_inputs():
    fp = _fill()
    # a probe killed after its first incremental write
    assert "full train step" in fp.render_slack({"full_step_us": 1480.0})
    assert "1480.0" in fp.render_slack({"full_step_us": 1480.0})
    out = fp.render_pipeline({"fp32_patch_base": {"imgs_per_sec": 1107.0, "mfu": 0.05},
                              "fp32_patch_pipelined": {"error": "OOM"}})
    assert "1107" in out and "FAILED: OOM" in out
    out = fp.render_lanepush({"lanes128_base": {"imgs_per_sec": 8300.0, "mfu": 0.26,
                                                "compile_s": 30.0},
                              "lanes1024_pipe": {"error": "RESOURCE_EXHAUSTED"}})
    assert "Best config: **lanes128_base**" in out
    out = fp.render_servingfold({"bf16_fold0_tta2_imgs_per_sec": 17800.0})
    assert "17800" in out  # no speedup key yet -> no verdict line, no crash
    out = fp.render_quant({"bf16_tta2_imgs_per_sec": 17800.0})
    assert "17800" in out
    win = fp.render_quant({"int8_vs_bf16_speedup": 1.6})
    assert "1.60x" in win and "POSITIVE" in win
    lose = fp.render_quant({"int8_vs_bf16_speedup": 1.01})
    assert "opt-in" in lose


def test_pipeline_verdict_lines():
    fp = _fill()
    win = fp.render_pipeline({"bf16_patch_speedup": 1.25})
    assert "1.25x" in win and "promote" in win
    lose = fp.render_pipeline({"bf16_patch_speedup": 0.97})
    assert "0.97x" in lose and "opt-in" in lose
