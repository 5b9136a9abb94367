#!/bin/bash
# Round-3 TPU work queue — run the moment the relay daemon is alive.
# Sequential (ONE TPU client process at a time; concurrent processes contend
# for the tunneled chip and corrupt every timing).  Each step logs to
# /tmp/tpu_q_<step>.log; safe to re-run — steps are independent.
#
# Usage:  nohup bash scripts/tpu_round3_queue.sh > /tmp/tpu_queue.log 2>&1 &
#         tail -f /tmp/tpu_queue.log

set -u
cd "$(dirname "$0")/.."

step() {
  local name="$1"; shift
  echo "=== $name: $(date +%T) ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/tpu_q_${name}.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) (log: /tmp/tpu_q_${name}.log) ==="
}

# 0. liveness gate — bail fast if the relay is still dead (the probe
#    definition lives in bench.py:_PROBE_CODE — one source of truth)
if ! timeout 200 python bench.py --probe 150; then
  echo "relay DEAD — aborting queue"
  exit 1
fi
echo "relay alive"

# 1. can compiled executables be serialized? (would kill the per-process
#    remote-compile cost — integrate into bench.py if rc=0)
step aot_probe python scripts/exp_aot_cache.py

# 2. the official perf artifact's program: full bench (compile + best-of-3)
step bench python bench.py

# 3. ensemble E2E with the round-3 combiner prep (target: <= 4 s warm)
step ensemble python scripts/bench_ensemble_e2e.py

# 4. kernel smoke of every static Pallas variant on real hardware (interpret
#    mode cannot catch Mosaic lowering bugs)
step kernel_smoke python scripts/exp_dense_smoke.py

# 4b. same for the sparse chunk kernels (refit/thresh/weighted/LL variants);
#     Pallas-only compiles are fast (~1s each), so this step is cheap
step chunks_smoke python scripts/exp_chunks_smoke.py

# 5. round-3 kernel grid-layout sweep: device parity + timing vs the shipped
#    kernel at k in {20, 100, 200} (9 loop programs to compile -> long budget)
STEP_TIMEOUT=5400 step kernel_v3 python scripts/exp_kernel_v3.py

# 6. second bench run: if the runtime supports SerializeExecutable, this one
#    loads the fit program from the AOT disk cache (compare "# aot_cache"
#    stderr lines between /tmp/tpu_q_bench.log and this log)
step bench_aot_warm python bench.py

# 7. full bench through the production fit program with the jo_resident grid
#    layout (apples-to-apples Gupd/s vs step 2; ENSTOP_EM_KERNEL is read at
#    trace time so the fresh process compiles the variant program)
ENSTOP_EM_KERNEL=jo_resident ENSTOP_AOT_CACHE=0 step bench_jores python bench.py

# 8. ensemble E2E through the variant layouts (exercises the refit variant
#    too; compare to step 3's number)
ENSTOP_EM_KERNEL=jo_resident step ensemble_jores python scripts/bench_ensemble_e2e.py

# 9. sparse-path table refresh (configs A/B/D) under the round-3 bucketed
#    padding — compare against docs/PERFORMANCE.md's round-2 numbers (the
#    buckets add <= ~6% rows to the SELL programs)
step sparse_bench python scripts/bench_sparse.py

echo "=== queue complete $(date +%T) ==="
