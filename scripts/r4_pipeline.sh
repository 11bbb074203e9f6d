#!/bin/bash
# ARCHIVAL (round 4) — kept as provenance for results/r4_probes/. Round 5
# runs probes interactively (committed as each lands) instead of via a
# round-end supervisor: this pipeline held the relay at the round-4
# snapshot and starved the driver's bench (VERDICT r04 weak #1).
#
# Round-4 TPU measurement pipeline (supervisor).
# Usage: r4_pipeline.sh <waiter_output_log> <waiter_pid> [deadline_HH:MM]
#
# Waits for the already-running relay waiter to print "TPU BACK", then runs
# the round-4 probes SEQUENTIALLY (the relay admits one client), re-checking
# relay health between stages. Every probe prints partial results
# line-by-line, so even an interrupted stage leaves usable numbers.
#
# DEADLINE POLICY (round-3 lesson: the driver's own end-of-round bench.py
# must find the relay free): no stage may run past DEADLINE. Each stage's
# timeout is clamped to the time remaining; a stage with <10 min of budget
# is skipped. If recovery comes late, probes are dropped in reverse priority
# and bench.py (the official-record rehearsal + XLA cache seed) runs first.
set -u
cd /root/repo
WAITER_LOG=$1
WPID=$2
DEADLINE=${3:-18:30}
L=/tmp/r4_pipeline; mkdir -p "$L"
note() { echo "$(date +%H:%M:%S) $*" >> "$L/pipeline.log"; }
export PYTHONPATH=/root/repo:/root/.axon_site

secs_left() {
    local now dl
    now=$(date +%s)
    dl=$(date -d "today $DEADLINE" +%s)
    # A deadline "behind" us by more than 5 min means it crosses midnight
    # (e.g. supervisor started 21:00 with deadline 07:45): roll to tomorrow.
    [ $(( dl - now )) -lt -300 ] && dl=$(( dl + 86400 ))
    echo $(( dl - now ))
}

note "supervisor start; watching $WAITER_LOG (waiter pid $WPID), deadline $DEADLINE"
while ! grep -q "TPU BACK" "$WAITER_LOG" 2>/dev/null; do
    kill -0 "$WPID" 2>/dev/null || { note "waiter exited without recovery; aborting"; exit 1; }
    [ "$(secs_left)" -lt 600 ] && { note "deadline reached before recovery; aborting"; exit 1; }
    sleep 60
done
note "TPU BACK detected ($(secs_left)s to deadline)"

run() { # run <name> <default_timeout_s> <cmd...>
    local name=$1 want=$2; shift 2
    local left; left=$(secs_left)
    local budget=$(( want < left ? want : left ))
    if [ "$budget" -lt 600 ]; then note "$name SKIPPED (only ${left}s to deadline)"; return 1; fi
    note "$name start (timeout ${budget}s)"
    # BENCH_WATCHDOG_SECS is read ONLY by the bench.py stage (ADVICE r04
    # low: probe stages are still SIGTERM-killed at their budget). Round-5
    # bench.py treats it as an ABSOLUTE wall budget from process start and
    # also traps SIGTERM (ADVICE r04 medium: the old re-arm-after-init could
    # push the alarm past the external kill; now it clamps to the deadline).
    BENCH_WATCHDOG_SECS=$(( budget - 120 )) timeout "$budget" "$@" > "$L/$name.log" 2>&1
    note "$name rc=$?"
}
wait_healthy() {
    local left; left=$(secs_left)
    [ "$left" -lt 600 ] && { note "healthwait skipped (deadline)"; return 1; }
    note "healthwait start"
    timeout $(( left < 7200 ? left : 7200 )) python3 scripts/r4_tpu_waiter.py 2100 120 >> "$L/healthwait.log" 2>&1
    note "healthwait rc=$?"
}

fill() { python3 scripts/r4_fill_perf.py >> "$L/pipeline.log" 2>&1; }

if [ "$(secs_left)" -ge 14400 ]; then
    # EARLY recovery: full probe sequence, then the bench rehearsal.
    run lane128 10800 python3 scripts/r4_lane_attribution.py 128 48
    fill
    wait_healthy
    run b1slack 7200 python3 scripts/r4_b1_slack_probe.py 2048
    fill
    wait_healthy
    run b1pipe 5400 python3 scripts/r4_b1_pipeline_probe.py 2048
    fill
    wait_healthy
    run lanepush 10800 python3 scripts/r4_lane_push_probe.py 2048
    wait_healthy
    run servingfold 7200 python3 scripts/r4_serving_fold_probe.py
    fill
    wait_healthy
    run quant 5400 python3 scripts/r4_quant_probe.py
    wait_healthy
    run bench 5400 python3 bench.py
else
    # LATE recovery: official-record rehearsal first (seeds the XLA cache
    # for the driver's own bench), then whatever probes still fit.
    run bench 5400 python3 bench.py
    wait_healthy
    run lane128 7200 python3 scripts/r4_lane_attribution.py 128 48
    fill
    wait_healthy
    run b1slack 5400 python3 scripts/r4_b1_slack_probe.py 2048
    fill
    wait_healthy
    run b1pipe 5400 python3 scripts/r4_b1_pipeline_probe.py 2048
    fill
    wait_healthy
    run lanepush 7200 python3 scripts/r4_lane_push_probe.py 2048
    wait_healthy
    run servingfold 5400 python3 scripts/r4_serving_fold_probe.py
    fill
    wait_healthy
    run quant 5400 python3 scripts/r4_quant_probe.py
fi
fill
note "pipeline done ($(secs_left)s to deadline)"
