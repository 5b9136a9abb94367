"""Multi-device scaling demo: pLSA over a (docs x vocab) TPU mesh.

Shows the three parallel execution modes on whatever devices are available
(works identically on a virtual CPU mesh — run with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``):

1. ``DistributedPLSA`` — one fit sharded over every device;
2. ``BlockParallelPLSA`` with an explicit 2D mesh shape;
3. the sharded ensemble fan-out — all bootstrap fits in one SPMD program.

Run:  python examples/mesh_scaling.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "examples")
from _common import ensure_responsive_backend

ensure_responsive_backend()

import jax

from enstop_tpu import BlockParallelPLSA, DistributedPLSA
from enstop_tpu.models.ensemble import ensemble_of_topics
from enstop_tpu.synthetic import synthetic_corpus


def main():
    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")

    X, labels = synthetic_corpus(n_docs=2000, n_words=4000, n_topics=10,
                                 tokens_per_doc=120, seed=0)
    print(f"corpus: {X.shape} nnz={X.nnz}")

    t0 = time.time()
    model = DistributedPLSA(n_components=10, n_iter=40, random_state=0)
    model.fit(X)
    print(f"DistributedPLSA (all devices, docs-sharded): {time.time()-t0:.1f}s "
          f"steps={model.n_iter_} ll={model.fit_info_['log_likelihood']:.1f}")

    if len(devices) >= 2:
        t0 = time.time()
        model2 = BlockParallelPLSA(
            n_components=10, n_row_blocks=len(devices) // 2, n_col_blocks=2,
            n_iter=40, random_state=0,
        )
        model2.fit(X)
        print(f"BlockParallelPLSA (2D mesh {len(devices)//2}x2): {time.time()-t0:.1f}s "
              f"steps={model2.n_iter_}")
        drift = np.abs(model2.components_ - model.components_).max()
        print(f"  max |Δcomponents| vs docs-sharded fit: {drift:.2e} "
              "(same math, different mesh)")

    t0 = time.time()
    stack = ensemble_of_topics(
        X, 10, n_runs=len(devices), parallelism="sharded", random_state=0, n_iter=40
    )
    print(f"sharded ensemble fan-out ({len(devices)} runs, one SPMD program): "
          f"{time.time()-t0:.1f}s -> {stack.shape[0]} candidate topics")


if __name__ == "__main__":
    main()
