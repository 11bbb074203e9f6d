#!/usr/bin/env python3
"""Format the round-4 probe JSONs (/tmp/r4_*.json) into the PERF.md
placeholder sections, so the measurements land in the committed record even
if the round ends right after the probes finish.

Idempotent: each placeholder comment is left in place and the generated
block between it and the next section is regenerated on re-run.

Usage: python3 scripts/r4_fill_perf.py   (no TPU access; pure text)
"""

import json
import os
import re
import sys

PERF = os.path.join(os.path.dirname(__file__), "..", "PERF.md")

SLACK_TAG = "<!-- R4_SLACK_RESULTS -->"
LANE_TAG = "<!-- R4_LANE_RESULTS -->"
LANEPUSH_TAG = "<!-- R4_LANEPUSH_RESULTS -->"
PIPELINE_TAG = "<!-- R4_PIPELINE_RESULTS -->"
SERVINGFOLD_TAG = "<!-- R4_SERVINGFOLD_RESULTS -->"
QUANT_TAG = "<!-- R4_QUANT_RESULTS -->"
# A generated block ends at the next heading of ANY level (## or ###) —
# matching only "## " would swallow the ### subsections that follow a tag.
END_RE = re.compile(r"^#{2,3} ", re.M)


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def render_slack(d):
    der = d.get("derived", {})
    lines = [
        "",
        "| quantity | us/step |",
        "|---|---|",
        f"| full train step (B=1 fp32 patch_conv=32) | {d.get('full_step_us', float('nan')):.1f} |",
        f"| full step + independent ghost forward | {d.get('full_step_plus_ghost_us', float('nan')):.1f} |",
        f"| ghost marginal cost | {der.get('ghost_marginal_us', float('nan')):.1f} |",
        f"| standalone forward | {der.get('standalone_fwd_us', float('nan')):.1f} |",
        f"| overlap slack (standalone - marginal) | {der.get('overlap_slack_us', float('nan')):.1f} |",
        "",
    ]
    frac = der.get("slack_fraction_of_fwd")
    if frac is not None:
        if frac <= 0.15:
            verdict = (
                f"Slack is {frac:.0%} of a forward — the step already saturates the core: "
                "even a semantics-relaxed (stale-params) pipeline has no idle execution "
                "slack to hide the next forward in. Combined with the empty legal overlap "
                "window above, B=1 software pipelining is CLOSED with numbers: the "
                "dependency chain is the floor."
            )
        else:
            verdict = (
                f"Slack is {frac:.0%} of a forward — idle capacity exists during the step; "
                "a semantics-relaxed (stale-by-one trunk params) pipeline could recover up "
                "to that fraction and is worth building as a documented throughput mode."
            )
        lines += [verdict, ""]
    return "\n".join(lines)


def render_lane(d):
    lines = ["", "| variant | us/step | imgs/s |", "|---|---|---|"]
    order = ["full", "fwd_only", "dx_plus_head", "nodrop", "vanilla_head",
             "fp32_full", "fold_hires", "remat_trunk", "rbg"]
    for k in order:
        v = d.get(k)
        if not isinstance(v, dict):
            continue
        if "error" in v:
            lines.append(f"| {k} | FAILED: {v['error']} | — |")
        else:
            lines.append(f"| {k} | {v['us_per_step']:.0f} | {v['imgs_per_sec']:.0f} |")
    ca = d.get("cost_analysis")
    if ca:
        lines += [
            "",
            f"XLA cost_analysis of the standalone step: {ca['step_gflops']:.1f} GFLOP, "
            f"{ca['step_gbytes']:.2f} GB accessed (pre-fusion upper-ish bound) → arithmetic "
            f"intensity {ca['arithmetic_intensity_flops_per_byte']:.0f} FLOP/B; at the measured "
            f"step time this is {ca['mfu_at_197tflops']:.1%} MFU vs "
            f"{(ca['hbm_util_at_819gbs'] or 0):.1%} of HBM bandwidth — "
            + ("the step is HBM-bound; remat/fold are the right levers."
               if (ca.get("hbm_util_at_819gbs") or 0) > ca["mfu_at_197tflops"] * 1.5
               else "the step is closer to compute-bound than HBM-bound."),
        ]
    der = d.get("derived")
    if der:
        lines += [
            "",
            "Derived attribution (us/step): forward "
            f"{der['fwd_us']:.0f}; dx-chain + head backward "
            f"{der['dx_chain_plus_head_bwd_us']:.0f}; trunk dw + Adam "
            f"{der['trunk_dw_plus_adam_us']:.0f}; dropout marginal "
            f"{der['dropout_marginal_us']:.0f}; plastic-head marginal "
            f"{der['plastic_head_marginal_us']:.0f}; threefry→rbg RNG delta "
            f"{der['rbg_delta_us']:.0f}. bf16 speedup vs fp32 "
            f"{der['bf16_speedup_vs_fp32']:.2f}x"
            + (f"; fold_hires {der['fold_hires_speedup']:.2f}x" if "fold_hires_speedup" in der else "")
            + (f"; remat_trunk {der['remat_trunk_speedup']:.2f}x" if "remat_trunk_speedup" in der else "")
            + ".",
        ]
    lines.append("")
    return "\n".join(lines)


def render_lanepush(d):
    lines = ["", "| config | imgs/s | MFU | compile s |", "|---|---|---|---|"]
    best = (None, 0.0)
    for key, v in d.items():
        if not isinstance(v, dict):
            continue
        if "error" in v:
            lines.append(f"| {key} | FAILED: {v['error']} | — | — |")
            continue
        mfu = v.get("mfu")
        lines.append(
            f"| {key} | {v['imgs_per_sec']:.0f} | "
            f"{(f'{mfu:.1%}' if mfu else '—')} | {v.get('compile_s', 0):.0f} |"
        )
        if v["imgs_per_sec"] > best[1]:
            best = (key, v["imgs_per_sec"])
    if best[0]:
        lines += ["", f"Best config: **{best[0]}** at {best[1]:.0f} imgs/s."]
    lines.append("")
    return "\n".join(lines)


def render_pipeline(d):
    lines = ["", "| config | imgs/s | MFU |", "|---|---|---|"]
    for key in ("fp32_patch_base", "fp32_patch_pipelined",
                "bf16_patch_base", "bf16_patch_pipelined"):
        v = d.get(key)
        if not isinstance(v, dict):
            continue
        if "error" in v:
            lines.append(f"| {key} | FAILED: {v['error']} | — |")
        else:
            mfu = v.get("mfu")
            lines.append(
                f"| {key} | {v['imgs_per_sec']:.0f} | "
                f"{(f'{mfu:.1%}' if mfu else '—')} |"
            )
    verdicts = []
    for pre in ("fp32_patch", "bf16_patch"):
        sp = d.get(f"{pre}_speedup")
        if sp is None:
            continue
        if sp > 1.05:
            verdicts.append(
                f"{pre}: **{sp:.2f}x** — the relaxed pipeline recovers real idle "
                "slack; promote to the documented B=1 throughput recommendation."
            )
        else:
            verdicts.append(
                f"{pre}: {sp:.2f}x — no material win; consistent with the "
                "slack probe's saturation reading. Keep --pipelined opt-in and "
                "treat the sequential dependency chain as the B=1 floor."
            )
    if verdicts:
        lines += [""] + verdicts
    lines.append("")
    return "\n".join(lines)


def render_servingfold(d):
    lines = ["", "| config | imgs/s (2-view TTA) |", "|---|---|"]
    for key, v in d.items():
        if key.endswith("_imgs_per_sec"):
            lines.append(f"| {key[: -len('_imgs_per_sec')]} | {v:.0f} |")
    sp = d.get("bf16_fold_speedup")
    if sp is not None:
        verdict = ("POSITIVE — promote fold_hires to the serving default."
                   if sp > 1.02 else
                   "neutral/negative on the inference path too — keep fold_hires opt-in.")
        lines += ["", f"bf16 fold speedup: {sp:.2f}x → {verdict}"]
    lines.append("")
    return "\n".join(lines)


def render_quant(d):
    lines = ["", "| config | imgs/s (2-view TTA) |", "|---|---|"]
    for key, v in d.items():
        if key.endswith("_imgs_per_sec"):
            lines.append(f"| {key[: -len('_imgs_per_sec')]} | {v:.0f} |")
    sp = d.get("int8_vs_bf16_speedup")
    if sp is not None:
        verdict = ("POSITIVE — int8 is the new serving throughput recommendation "
                   "(quality validated separately, QUALITY.md int8 study)."
                   if sp > 1.05 else
                   "below the fusion-overhead bar — the quant/dequant elementwise "
                   "cost eats the MXU dtype win at this model size; keep int8 opt-in.")
        lines += ["", f"best int8 vs bf16 speedup: {sp:.2f}x → {verdict}"]
    lines.append("")
    return "\n".join(lines)


def splice(text, tag, block):
    i = text.index(tag) + len(tag)
    m = END_RE.search(text, i)
    j = m.start() if m else len(text)
    return text[:i] + "\n" + block + "\n" + text[j:]


def main():
    with open(PERF) as f:
        text = f.read()
    changed = []
    slack = _load("/tmp/r4_b1_slack.json")
    if slack and SLACK_TAG in text:
        text = splice(text, SLACK_TAG, render_slack(slack))
        changed.append("slack")
    lane = _load("/tmp/r4_lane128_attribution.json")
    if lane and LANE_TAG in text:
        text = splice(text, LANE_TAG, render_lane(lane))
        changed.append("lane128")
    pipe = _load("/tmp/r4_b1_pipeline.json")
    if pipe and PIPELINE_TAG in text:
        text = splice(text, PIPELINE_TAG, render_pipeline(pipe))
        changed.append("b1pipeline")
    push = _load("/tmp/r4_lane_push.json")
    if push and LANEPUSH_TAG in text:
        text = splice(text, LANEPUSH_TAG, render_lanepush(push))
        changed.append("lanepush")
    fold = _load("/tmp/r4_serving_fold.json")
    if fold and SERVINGFOLD_TAG in text:
        text = splice(text, SERVINGFOLD_TAG, render_servingfold(fold))
        changed.append("servingfold")
    quant = _load("/tmp/r4_quant.json")
    if quant and QUANT_TAG in text:
        text = splice(text, QUANT_TAG, render_quant(quant))
        changed.append("quant")
    if changed:
        with open(PERF, "w") as f:
            f.write(text)
    print(f"filled: {changed or 'nothing (no probe JSONs found)'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
