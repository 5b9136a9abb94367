"""Hardware A/B of precision="fast" (bf16 responsibilities) vs "default".

Runs the PRODUCTION folded while-loop fit program (the same one bench.py
times) at 20NG scale twice — precision="default" and precision="fast" — and
reports Gupd/s for both, plus the fast run's final-LL deviation from the
exact run (the honesty metric: "same optimum" must be a number, not a hope).

TPU-only (exits cleanly when the relay is dead).  One JSON line per
measurement; designed for the round-5 queue (logs/tpu_queue_r5/).
"""
import json
import sys
import time

sys.path.insert(0, ".")
import numpy as np

import bench as _bench

if not _bench._device_responsive(180):
    print("# device backend unresponsive; skipping (TPU-only measurement)",
          file=sys.stderr, flush=True)
    sys.exit(0)


def main():
    import jax
    import jax.numpy as jnp

    from enstop_tpu.ops.data import pad_factors, pad_vector
    from enstop_tpu.ops.driver import (_build_fit_fn, prepare_counts,
                                       resolve_backend)
    from enstop_tpu.ops.init import plsa_init

    print("# backend:", jax.default_backend(), file=sys.stderr, flush=True)
    X = _bench.synthetic_20ng()
    K, N_ITER = _bench.K, _bench.N_ITER
    nnz = X.nnz
    print(f"# corpus ready: nnz={nnz}", file=sys.stderr, flush=True)

    pzd0, pwz0 = plsa_init(X, K, rng=np.random.RandomState(1))
    prep = prepare_counts(X)
    backend = resolve_backend("auto")
    Xd = prep.device_array
    zd, wz = pad_factors(pzd0, pwz0, Xd.shape[0], Xd.shape[1])
    w = jnp.asarray(pad_vector(np.ones(X.shape[0], np.float32), Xd.shape[0]))
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)

    final_ll = {}
    for prec in ("default", "fast"):
        run = _build_fit_fn(backend, N_ITER, 10, True, False, prec)
        t0 = time.time()
        out = run.full(Xd, zd, wz, w, jnp.float32(0.0))
        _ = np.asarray(out[0][:1, :1])
        print(f"# [{prec}] compile+first run {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        assert int(np.asarray(out[2])) == N_ITER
        walls = []
        for rep in range(3):
            t0 = time.time()
            out = run.full(Xd, zd, wz, w, jnp.float32(0.0))
            _ = np.asarray(out[0][:1, :1])  # hard sync (host transfer)
            walls.append(time.time() - t0)
            print(f"# [{prec}] rep {rep}: {walls[-1]:.3f}s", file=sys.stderr,
                  flush=True)
        wall = min(walls)
        final_ll[prec] = float(np.asarray(out[3]))
        updates_per_s = N_ITER * nnz * K / wall
        print(json.dumps({
            "metric": f"plsa_em_updates_per_s_20ng_k20_precision_{prec}",
            "value": round(updates_per_s / 1e9, 4),
            "unit": "Gupdates/s (100-iter production fit incl. LL tests)",
            "wall_s_best": round(wall, 4),
            "vs_baseline": round(
                updates_per_s / _bench.BASELINE_1CORE_UPDATES_PER_S, 2
            ),
            "backend": jax.default_backend(),
            "final_ll": final_ll[prec],
        }), flush=True)

    rel = abs(final_ll["fast"] - final_ll["default"]) / abs(final_ll["default"])
    print(json.dumps({
        "metric": "fast_mode_final_ll_relative_deviation",
        "value": rel,
        "note": "bf16-responsibilities fit vs exact fit, same init, "
                "100 iters at 20NG scale",
    }), flush=True)


if __name__ == "__main__":
    main()
