#!/bin/bash
# Round-5 follow-up TPU queue — the measurements still outstanding after the
# main round-5 queue ran (logs/tpu_queue_r5/):
#   1. ensemble E2E under precision="fast" (the <=4 s warm goal: default warm
#      best was 4.59 s with the fit drain ~0.7 s above the fast fit's)
#   2. a fresh default-precision ensemble E2E in the same session for an
#      apples-to-apples A/B (day-dependent relay latency)
# Sequential (ONE TPU client process at a time).
#
# Usage:  RELAY_QUEUE=scripts/tpu_round5b_queue.sh RELAY_LOGDIR=logs/tpu_queue_r5b \
#           nohup bash scripts/relay_watch.sh > /tmp/relay_watch5b.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

step() {
  local name="$1"; shift
  echo "=== $name: $(date +%T) ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/tpu_q5_${name}.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) (log: /tmp/tpu_q5_${name}.log) ==="
}

if ! timeout 200 python bench.py --probe 150; then
  echo "relay DEAD — aborting queue"
  exit 1
fi
echo "relay alive"

# 1. fast-mode ensemble E2E (VERDICT item 6 stretch goal; fast fits measured
#    1.37x on this corpus — expected to pull the warm E2E under 4 s)
ENSTOP_BENCH_PRECISION=fast STEP_TIMEOUT=3600 \
  step ensemble_fast python scripts/bench_ensemble_e2e.py

# 2. same-session default A/B so the comparison shares relay conditions
STEP_TIMEOUT=3600 step ensemble_ab_default python scripts/bench_ensemble_e2e.py

echo "=== queue complete $(date +%T) ==="
