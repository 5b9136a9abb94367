"""Fresh-process ensemble cold-wall probe (AOT-cache value, user-facing).

The warm-rep E2E bench (bench_ensemble_e2e.py) deliberately excludes compile
time; THIS script measures what a user's *fresh process* pays for its first
full EnsembleTopics fit (k=20, 16 bootstraps, 20NG scale) — the remote
compiles included — and how much of that the AOT executable disk cache
(enstop_tpu/aot_cache.py) removes.

Run it twice with the same ENSTOP_AOT_DIR: process 1 is the true cold run
(all disk misses, writes entries incl. the fit program, densify scatter and
the UMAP layout SGD program), process 2 reloads everything it can.

  ENSTOP_AOT_CACHE=1 ENSTOP_AOT_DIR=/tmp/aot_probe python scripts/exp_fresh_process_ensemble.py
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

import bench as _bench

# default = quick liveness check; queue scripts raise the budget through the
# env when the relay is flapping and a step should out-wait a bad window
_PROBE_BUDGET_S = float(os.environ.get("ENSTOP_BENCH_PROBE_BUDGET_S", 180))

if not _bench._device_responsive(_PROBE_BUDGET_S):
    print("# device backend unresponsive; skipping (TPU-only measurement)",
          file=sys.stderr, flush=True)
    sys.exit(0)


def main():
    import jax

    from bench import synthetic_20ng
    from enstop_tpu import EnsembleTopics, aot_cache

    t_start = time.time()
    prec = os.environ.get("ENSTOP_BENCH_PRECISION", "default")
    X = synthetic_20ng()
    print(f"# backend: {jax.default_backend()} precision: {prec} "
          f"aot_cache: {aot_cache.enabled()} dir: {aot_cache.cache_dir()}",
          file=sys.stderr, flush=True)

    t0 = time.time()
    model = EnsembleTopics(n_components=20, n_starts=16, n_iter=100,
                           random_state=42, precision=prec).fit(X)
    fit_wall = time.time() - t0

    stats = {"disk_hits": 0, "disk_misses": 0, "mem_hits": 0}
    for w in aot_cache._WRAPPERS:
        for k in stats:
            stats[k] += w.stats[k]
    from enstop_tpu.models.ensemble import ensemble_fit

    stages = {k: round(v, 2)
              for k, v in getattr(ensemble_fit, "last_timings", {}).items()}
    rec = {
        "metric": "ensemble_fresh_process_wall_s",
        "value": round(fit_wall, 2),
        "unit": "s (first full fit of a fresh process, compiles included)",
        "process_wall_s": round(time.time() - t_start, 2),
        "aot": stats,
        "stages": stages,
        "backend": jax.default_backend(),
        "precision": prec,
        "n_topics_found": int(model.n_components_),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
