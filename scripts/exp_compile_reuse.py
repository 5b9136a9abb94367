"""Serving compile-reuse proof on the real remote compiler (VERDICT r03 #7).

The reference has no compile problem (numba caches per-process); this
rebuild's serving-latency risk is the 30s-10+min remote compile per program
shape.  Round 3's answer is shape bucketing (`ops/sell.py:_bucket_rows` +
`pad_rows`): transform batches whose row counts fall in one bucket share a
single compiled refit program.  CPU-verified by
tests/test_program_cache.py; THIS script is the hardware half — run it on
the live relay and read two facts out of the log:

* `remote compiles: fit=1 transform=1` — N differently-sized transform
  batches inside one bucket paid exactly ONE remote compile;
* the per-batch warm transform latencies (serving latency after warmup).

Writes nothing; prints a JSON summary line at the end.
"""

import json
import logging
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")  # run from the repo root (PYTHONPATH breaks axon)


def main():
    import jax

    from enstop_tpu import PLSA

    rng = np.random.RandomState(7)
    X = sp.random(4096, 2000, density=0.03, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 4).astype(np.float32)
    X = sp.csr_matrix(X)

    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(handler)
    jax.config.update("jax_log_compiles", True)

    t0 = time.time()
    model = PLSA(n_components=8, n_iter=20, random_state=0).fit(X)
    fit_wall = time.time() - t0
    fit_compiles = len([r for r in records if "Compiling" in r or "jit(" in r])
    print(f"# fit: {fit_wall:.1f}s, {fit_compiles} compile log lines",
          file=sys.stderr, flush=True)

    # serving batches: varying sizes inside one row bucket (bucket floor is
    # 128 rows — all of these round to the same padded program shape)
    sizes = [900, 1000, 1003, 960, 1015, 990]
    walls = []
    n_before = len(records)
    for i, s in enumerate(sizes):
        lo = (i * 37) % (X.shape[0] - s)
        batch = X[lo:lo + s]
        t0 = time.time()
        emb = model.transform(batch)
        np.asarray(emb)  # host sync
        walls.append(time.time() - t0)
        print(f"# transform[{i}] rows={s}: {walls[-1]:.3f}s",
              file=sys.stderr, flush=True)
    transform_compiles = [
        r for r in records[n_before:] if "jit(run)" in r
    ]

    print(json.dumps({
        "metric": "serving_compile_reuse",
        "n_transform_batches": len(sizes),
        "transform_remote_compiles": len(transform_compiles),
        "transform_wall_s": [round(w, 3) for w in walls],
        "warm_transform_wall_s": round(min(walls[1:]), 3),
        "backend": jax.default_backend(),
    }))
    if len(transform_compiles) > 1:
        print("# FAIL: expected ONE compile across all transform batches; "
              f"got {len(transform_compiles)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
