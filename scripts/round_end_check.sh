#!/bin/bash
# Round-end gate (VERDICT r04 item 2b): run before the final commit of a
# round. Exits non-zero if the snapshot would land in a bad state:
#   1. a live python process that could be holding the TPU relay
#      (the round-4 driver bench was starved by a self-launched pipeline)
#   2. uncommitted measurement evidence (PERF.md / results/ / *.md)
# Usage: bash scripts/round_end_check.sh   (from /root/repo)
set -u
fail=0

# 1. No python process may be alive except the environment's own tpu_init
#    daemon. (Listing only — this script never kills anything: killing a
#    TPU client mid-claim wedges the relay for ~20-30 min.)
live=$(ps -eo pid,args | grep -E "python[0-9]?" | grep -v grep | grep -v ".tpu_init.py" || true)
if [ -n "$live" ]; then
    echo "FAIL: live python process(es) at round end — finish or let them"
    echo "      self-terminate BEFORE the snapshot (do not kill mid-claim):"
    echo "$live"
    fail=1
else
    echo "ok: no live python processes"
fi

# 2. Evidence must be committed (a judge sees only the committed tree).
dirty=$(git status --porcelain -- PERF.md QUALITY.md PARITY*.md results/ 2>/dev/null || true)
if [ -n "$dirty" ]; then
    echo "FAIL: uncommitted measurement evidence:"
    echo "$dirty"
    fail=1
else
    echo "ok: PERF/QUALITY/PARITY/results are committed"
fi

exit $fail
