#!/bin/bash
# One-shot TPU measurement sequence (run when the tunnel is healthy).
# Each stage redirects to its own log under /tmp; runs are sequential
# (one host CPU; the tunnel serializes anyway). The remote-attached
# tunnel frees a client's session slot a little after the process
# exits, so stages (a) sleep between runs and (b) retry once on the
# "Unable to initialize backend" startup failure. Usage:
#   bash examples/measure_all.sh [outdir]
set -u
OUT=${1:-/tmp/measure_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# the example scripts put the checkout on sys.path themselves; a
# PYTHONPATH is NOT needed (and the repo stays out of subprocesses)

run_stage() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  local log="$OUT/$name.log"
  local ok=0
  for attempt in 1 2; do
    if timeout "$tmo" "$@" > "$log" 2>&1; then
      ok=1; break
    fi
    # retry (with a slot-release wait) only when a retry is still possible
    # and the failure is the tunnel-slot startup race
    if [ "$attempt" = 1 ] && grep -q "Unable to initialize backend" "$log"
    then
      echo "  ($name: tunnel slot not free yet; retrying in 90 s)"
      sleep 90
    else
      break
    fi
  done
  if [ "$ok" = 0 ]; then
    echo "  $name: FAILED (see $log)"
  fi
}

# wait for the tunnel to release the previous stage's session slot —
# called between stages, never after the last one
slot_wait() { sleep 60; }

echo "== exactness (both configs) =="
run_stage exactness 1800 python -u examples/exactness_check.py
tail -3 "$OUT/exactness.log"

slot_wait
echo "== per-stage profile =="
run_stage profile 1800 python -u examples/profile_stages.py
tail -15 "$OUT/profile.log"

slot_wait
echo "== bench =="
run_stage bench 1800 python -u bench.py
tail -2 "$OUT/bench.log"

slot_wait
echo "== whole brain 100k =="
run_stage whole_brain 3600 python -u examples/whole_brain.py
tail -8 "$OUT/whole_brain.log"
