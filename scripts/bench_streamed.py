"""Out-of-core StreamedPLSA throughput on the real chip.

Corpus: 120k docs x 60k vocab, 12M nnz — dense f32 would be 28.8 GB (beyond
HBM and host-friendly dense staging); the streamed path keeps host memory at
O(nnz) and streams each block's sparse arrays per iteration.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp
import jax

def main():
    print("# backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    n, m, nnz = 120_000, 60_000, 12_000_000
    p = 1.0 / np.arange(1, m + 1) ** 1.05
    p /= p.sum()
    rows = rng.randint(0, n, nnz)
    cols = rng.choice(m, size=nnz, p=p)
    X = sp.coo_matrix((np.ones(nnz, np.float32), (rows, cols)), shape=(n, m)).tocsr()
    X.sum_duplicates()
    print(f"# corpus {n}x{m} nnz={X.nnz}, dense f32 {n*m*4/1e9:.1f} GB", flush=True)

    from enstop_tpu.models.streamed_core import streamed_fit_core, _BlockStore

    t0 = time.time()
    store = _BlockStore(X, 30_000, False)
    print(f"# pack-once: {time.time()-t0:.1f}s, host store "
          f"{store.host_bytes()/1e9:.2f} GB", flush=True)

    t0 = time.time()
    zd, wz, steps, trace = streamed_fit_core(
        X, 20, block_docs=30_000, n_iter=6, n_iter_per_test=10, random_state=0)
    wall = time.time() - t0
    print(f"# fit: {steps} iters in {wall:.1f}s = {wall/steps:.2f} s/iter "
          f"({steps*X.nnz*20/wall/1e9:.2f} Gupd/s), trace {trace}", flush=True)

if __name__ == "__main__":
    main()
