#!/bin/bash
# Watch the TPU relay daemon; the moment it answers a tiny-op probe, touch
# /tmp/relay_alive and fire the TPU work queue (once).
# Usage: nohup bash scripts/relay_watch.sh > /tmp/relay_watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QUEUE="${RELAY_QUEUE:-scripts/tpu_round5_queue.sh}"
LOGDIR="${RELAY_LOGDIR:-logs/tpu_queue_r5}"

while true; do
  # the probe definition lives in bench.py (_PROBE_CODE) — one source of truth
  if timeout 200 python bench.py --probe 150; then
    date +%s > /tmp/relay_alive
    echo "relay ALIVE at $(date +%T) — launching $QUEUE"
    bash "$QUEUE"
    echo "queue finished at $(date +%T)"
    # persist the evidence (probe timeline + per-step logs) into the repo so
    # the round artifacts show the queue was armed and what it measured.
    # Only logs written since THIS queue launch: /tmp keeps logs from prior
    # rounds forever, and a bare glob would sweep stale measurements into the
    # current round's evidence dir.
    mkdir -p "$LOGDIR"
    # (a live watcher's own log keeps appending after relay_alive is
    # touched, so this filter still captures it — no unconditional copy,
    # which would re-import a stale prior-round file)
    for f in /tmp/relay_watch*.log /tmp/tpu_queue*.log /tmp/tpu_q*_*.log; do
      [ -e "$f" ] && [ "$f" -nt /tmp/relay_alive ] && cp -f "$f" "$LOGDIR/"
    done
    git add "$LOGDIR" && \
      git commit -m "TPU queue logs: live-relay measurement evidence" \
        -- "$LOGDIR" || true
    exit 0
  fi
  echo "relay dead at $(date +%T); retry in 900s"
  sleep 900
done
