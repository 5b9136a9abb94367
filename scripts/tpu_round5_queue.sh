#!/bin/bash
# Round-5 TPU work queue — run the moment the relay daemon is alive.
# Priority order per VERDICT r04 item 1: bench -> kernel sweep (writes the
# measured table) -> ensemble E2E -> compile reuse -> AOT probe.
# Sequential (ONE TPU client process at a time; concurrent processes contend
# for the tunneled chip and corrupt every timing).  Each step logs to
# /tmp/tpu_q5_<step>.log; safe to re-run — steps are independent.
#
# Usage:  RELAY_QUEUE=scripts/tpu_round5_queue.sh \
#           nohup bash scripts/relay_watch.sh > /tmp/relay_watch5.log 2>&1 &

set -u
cd "$(dirname "$0")/.."
# a step killed at its timeout must not lose its buffered measurements
export PYTHONUNBUFFERED=1

step() {
  local name="$1"; shift
  echo "=== $name: $(date +%T) ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/tpu_q5_${name}.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) (log: /tmp/tpu_q5_${name}.log) ==="
}

# 0. liveness gate — bail fast if the relay is still dead (the probe
#    definition lives in bench.py:_PROBE_CODE — one source of truth)
if ! timeout 200 python bench.py --probe 150; then
  echo "relay DEAD — aborting queue"
  exit 1
fi
echo "relay alive"

# 1. THE driver artifact's program: full bench (compile + best-of-3).
#    Done-condition of VERDICT item 1: backend:"tpu", vs_baseline >= 50.
STEP_TIMEOUT=5400 step bench python bench.py

# 2. kernel grid-layout sweep at k in {20,100,200}: device parity + timing,
#    WRITES enstop_tpu/data/kernel_measured.json (VERDICT items 1+2)
STEP_TIMEOUT=5400 step kernel_v3 python scripts/exp_kernel_v3.py

# 3. ensemble E2E warm target <= 4 s (VERDICT item 6)
step ensemble python scripts/bench_ensemble_e2e.py

# 4. serving compile-reuse proof on the real remote compiler
step compile_reuse python scripts/exp_compile_reuse.py

# 5. SerializeExecutable support probe (VERDICT item 9 — land the answer
#    either way)
step aot_probe python scripts/exp_aot_cache.py

# 6. second bench run through the AOT disk-cache reload path (compare
#    "# aot_cache" stderr lines with step 1's log)
step bench_aot_warm python bench.py

# 7. full bench with the jo_resident grid layout (apples-to-apples Gupd/s
#    vs step 1 through the production fit program)
ENSTOP_EM_KERNEL=jo_resident ENSTOP_AOT_CACHE=0 STEP_TIMEOUT=5400 \
  step bench_jores python bench.py

# 8. kernel smoke of every static Pallas variant on real hardware (interpret
#    mode cannot catch Mosaic lowering bugs)
step kernel_smoke python scripts/exp_dense_smoke.py
step chunks_smoke python scripts/exp_chunks_smoke.py

# 9. ensemble E2E through the variant layouts (exercises the refit variant)
ENSTOP_EM_KERNEL=jo_resident step ensemble_jores python scripts/bench_ensemble_e2e.py

# 10. sparse-path table refresh (configs A/B/D) under the bucketed padding
step sparse_bench python scripts/bench_sparse.py

# 11. persist the measured kernel table if the sweep wrote one (targeted
#     path-only commit: safe even with unrelated working-tree changes)
if [ -f enstop_tpu/data/kernel_measured.json ]; then
  git add enstop_tpu/data/kernel_measured.json
  git commit -m "Measured EM-kernel layout table from the live-relay sweep (exp_kernel_v3)" \
    -- enstop_tpu/data/kernel_measured.json || true
fi

echo "=== queue complete $(date +%T) ==="
