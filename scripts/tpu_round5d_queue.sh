#!/bin/bash
# Round-5d TPU queue — the one still-unmeasured user-facing number: what a
# FRESH PROCESS pays for its first full ensemble fit (remote compiles
# included), and how much the AOT executable disk cache removes.  Two fresh
# processes over one empty cache dir: process 1 = true cold (all misses,
# writes entries incl. the fit program, densify scatter and the newly wrapped
# UMAP layout-SGD program), process 2 = reload.
#
# Usage:  RELAY_QUEUE=scripts/tpu_round5d_queue.sh RELAY_LOGDIR=logs/tpu_queue_r5d \
#           nohup bash scripts/relay_watch.sh > /tmp/relay_watch5d.log 2>&1 &

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

AOT_DIR=/tmp/aot_probe_ens_q5d
rm -rf "$AOT_DIR"; mkdir -p "$AOT_DIR"

ENSTOP_AOT_CACHE=1 ENSTOP_AOT_DIR="$AOT_DIR" STEP_TIMEOUT=3600 \
  step fresh_ens_cold python scripts/exp_fresh_process_ensemble.py

ENSTOP_AOT_CACHE=1 ENSTOP_AOT_DIR="$AOT_DIR" STEP_TIMEOUT=3600 \
  step fresh_ens_reload python scripts/exp_fresh_process_ensemble.py

echo "# cache entries after both processes:"
ls -la "$AOT_DIR" || true

echo "=== queue complete $(date +%T) ==="
