#!/bin/bash
# Round-5f TPU queue — the bracket round-5e could not finish: a SAME-WINDOW
# fresh-process A/B of AOT reload vs no-cache compile.  5e proved the
# reloaded executables run warm-grade (stage breakdown: runs 4.3-4.8 s,
# combine 3.5-3.8 s, refit 0.5-1.1 s) but its no-cache bracket landed in a
# dead window.  Strategy here: run (reload, nocache) PAIRS back-to-back and
# repeat up to 3 times, stopping early once a pair lands with both runs'
# staging_s < 60 s — i.e. both measured in a good-grade relay window, so the
# pair is a fair compile-vs-reload comparison.
#
# Usage:  RELAY_QUEUE=scripts/tpu_round5f_queue.sh RELAY_LOGDIR=logs/tpu_queue_r5f \
#           nohup bash scripts/relay_watch.sh > /tmp/relay_watch5f.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

step() {
  local name="$1"; shift
  echo "=== $name: $(date +%T) ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/tpu_q5_${name}.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) (log: /tmp/tpu_q5_${name}.log) ==="
}

# max staging_s for a run to count as "good window" (warm-day staging is <5 s)
GOOD_S="${GOOD_WINDOW_STAGING_S:-60}"

# staging seconds from a probe log's JSON line; empty if the run produced none
staging_of() {
  python - "$1" <<'EOF'
import json, sys
val = ""
try:
    for line in open(sys.argv[1]):
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            val = rec.get("stages", {}).get("staging_s", "")
except OSError:
    pass
print(val)
EOF
}

export ENSTOP_BENCH_PROBE_BUDGET_S=900
ok=""
for attempt in 1 2 3 4 5 6; do
  if timeout 200 python bench.py --probe 150; then ok=1; break; fi
  echo "relay probe $attempt failed at $(date +%T); retry in 300s"
  sleep 300
done
if [ -z "$ok" ]; then
  echo "relay DEAD after 6 probes — aborting queue"
  exit 1
fi
echo "relay alive"

AOT_DIR=/tmp/aot_probe_ens_q5d   # round-5d/5e entries: known-good reload set
if [ ! -d "$AOT_DIR" ] || [ -z "$(ls "$AOT_DIR" 2>/dev/null)" ]; then
  echo "cache dir empty — seeding with one cold run first"
  mkdir -p "$AOT_DIR"
  ENSTOP_AOT_CACHE=1 ENSTOP_AOT_DIR="$AOT_DIR" STEP_TIMEOUT=3600 \
    step fresh_ens_seed python scripts/exp_fresh_process_ensemble.py
fi

for pair in 1 2 3; do
  ENSTOP_AOT_CACHE=1 ENSTOP_AOT_DIR="$AOT_DIR" STEP_TIMEOUT=3600 \
    step "fresh_ens_p${pair}_reload" python scripts/exp_fresh_process_ensemble.py
  ENSTOP_AOT_CACHE=0 STEP_TIMEOUT=3600 \
    step "fresh_ens_p${pair}_nocache" python scripts/exp_fresh_process_ensemble.py

  r=$(staging_of "/tmp/tpu_q5_fresh_ens_p${pair}_reload.log")
  n=$(staging_of "/tmp/tpu_q5_fresh_ens_p${pair}_nocache.log")
  echo "pair $pair staging: reload=${r:-none} nocache=${n:-none}"
  if [ -n "$r" ] && [ -n "$n" ] && \
     python -c "import sys; sys.exit(0 if float('$r') < $GOOD_S and float('$n') < $GOOD_S else 1)"; then
    echo "pair $pair landed in a good window — A/B captured, stopping"
    break
  fi
  echo "pair $pair degraded or incomplete; retrying in 120s"
  sleep 120
done

echo "=== queue complete $(date +%T) ==="
