"""Execution-strategy selection for corpora of increasing scale.

Walks the decision surface a production user faces (docs/PERFORMANCE.md):

  1. fits dense in HBM            -> PLSA()                        (fastest)
  2. dense rectangle exceeds HBM,
     nonzeros fit                 -> PLSA(backend="sparse")        (O(nnz) resident)
  3. nonzeros exceed one chip     -> DistributedPLSA(layout="sparse")  (docs mesh)
  4. nonzeros exceed all HBM      -> StreamedPLSA()                (host O(nnz),
                                                                    device O(block))

Run:  python examples/large_sparse_corpus.py [--scale small|large]
(small runs everywhere; large assumes a real accelerator)
"""

import argparse
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
sys.path.insert(0, "examples")
from _common import ensure_responsive_backend

ensure_responsive_backend()


def make_corpus(n_docs, n_words, nnz, seed=0):
    rng = np.random.RandomState(seed)
    p = 1.0 / np.arange(1, n_words + 1) ** 1.05
    p /= p.sum()
    rows = rng.randint(0, n_docs, nnz)
    cols = rng.choice(n_words, size=nnz, p=p)
    X = sp.coo_matrix((np.ones(nnz, np.float32), (rows, cols)),
                      shape=(n_docs, n_words)).tocsr()
    X.sum_duplicates()
    return X


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["small", "large"], default="small")
    args = ap.parse_args()

    import jax

    from enstop_tpu import PLSA, StreamedPLSA, DistributedPLSA

    if args.scale == "small":
        n, m, nnz, k, iters = 3000, 5000, 150_000, 8, 20
    else:
        n, m, nnz, k, iters = 40_000, 141_000, 4_000_000, 20, 50

    X = make_corpus(n, m, nnz)
    dense_gb = n * m * 4 / 1e9
    print(f"corpus: {n}x{m}, nnz={X.nnz}, dense f32 would be {dense_gb:.1f} GB")

    for label, model in [
        ("dense resident  PLSA()", PLSA(n_components=k, n_iter=iters, random_state=0)),
        ("sparse resident PLSA(backend='sparse')",
         PLSA(n_components=k, n_iter=iters, random_state=0, backend="sparse")),
        ("sparse mesh     DistributedPLSA(layout='sparse')",
         DistributedPLSA(n_components=k, n_iter=iters, random_state=0,
                         layout="sparse")),
        ("out-of-core     StreamedPLSA()",
         StreamedPLSA(n_components=k, n_iter=iters, random_state=0,
                      block_size=max(n // 4, 256))),
    ]:
        t0 = time.time()
        model.fit(X)
        wall = time.time() - t0
        ll = float(model.history_[-1]) if hasattr(model, "history_") else float("nan")
        print(f"{label:50s} {wall:7.2f}s  final LL {ll:.0f}")


if __name__ == "__main__":
    main()
