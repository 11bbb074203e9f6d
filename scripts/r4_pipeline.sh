#!/bin/bash
# Round-4 TPU measurement pipeline (supervisor).
# Usage: r4_pipeline.sh <waiter_output_log> <waiter_pid>
# Waits for the already-running relay waiter to print "TPU BACK", then runs
# the round-4 probes SEQUENTIALLY (the relay admits one client), re-checking
# relay health between stages (a timed-out stage may leave a ~20-30 min
# wedge; the health wait outlasts it). Every probe prints partial results
# line-by-line, so even an interrupted stage leaves usable numbers.
set -u
cd /root/repo
WAITER_LOG=$1
WPID=$2
L=/tmp/r4_pipeline; mkdir -p "$L"
note() { echo "$(date +%H:%M:%S) $*" >> "$L/pipeline.log"; }
export PYTHONPATH=/root/repo:/root/.axon_site

note "supervisor start; watching $WAITER_LOG (waiter pid $WPID)"
while ! grep -q "TPU BACK" "$WAITER_LOG" 2>/dev/null; do
    kill -0 "$WPID" 2>/dev/null || { note "waiter exited without recovery; aborting"; exit 1; }
    sleep 60
done
note "TPU BACK detected"

run() { local name=$1; shift; note "$name start"; timeout "$@" > "$L/$name.log" 2>&1; note "$name rc=$?"; }
wait_healthy() {
    note "healthwait start"
    timeout 7200 python3 scripts/r4_tpu_waiter.py 2100 120 >> "$L/healthwait.log" 2>&1
    note "healthwait rc=$?"
}

run lane128 10800 python3 scripts/r4_lane_attribution.py 128 48
wait_healthy
run b1slack 7200 python3 scripts/r4_b1_slack_probe.py 2048
wait_healthy
run lanepush 10800 python3 scripts/r4_lane_push_probe.py 2048
wait_healthy
run servingfold 7200 python3 scripts/r4_serving_fold_probe.py
note "pipeline done"
