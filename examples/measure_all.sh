#!/bin/bash
# One-shot TPU measurement sequence (run when the tunnel is healthy).
# Each stage redirects to its own log under /tmp; runs are sequential
# (one host CPU; the tunnel serializes anyway). Usage:
#   bash examples/measure_all.sh [outdir]
set -u
OUT=${1:-/tmp/measure_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# `python examples/foo.py` puts examples/ (not the repo root) on sys.path
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "== exactness (both configs) =="
timeout 1800 python -u examples/exactness_check.py > "$OUT/exactness.log" 2>&1
tail -3 "$OUT/exactness.log"

echo "== per-stage profile =="
timeout 1800 python -u examples/profile_stages.py > "$OUT/profile.log" 2>&1
tail -15 "$OUT/profile.log"

echo "== bench =="
timeout 1800 python -u bench.py > "$OUT/bench.log" 2>&1
tail -2 "$OUT/bench.log"

echo "== whole brain 100k =="
timeout 3600 python -u examples/whole_brain.py > "$OUT/whole_brain.log" 2>&1
tail -8 "$OUT/whole_brain.log"
