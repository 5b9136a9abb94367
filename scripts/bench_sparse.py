"""Sparse-vs-dense EM benchmark on the real TPU (VERDICT round-2 item 1).

Three workloads:
  A. 20NG shape (18846 x 25k, nnz 2.2M, density 0.57%) — dense home turf
  B. 10x sparser / large vocab (20k x 141k, nnz 2.2M, density 0.078%) —
     PubMed-like vocabulary; dense still fits (bf16 5.6 GB) for comparison
  C. sparse-only scale (250k x 141k, nnz 25M, density 0.07%) — the dense
     rectangle would be 70 GB bf16 (> HBM); only the O(nnz) path can run it

For A and B: fused dense kernel vs SELL sparse path (gather and scatter
segment-sum variants).  For C: SELL only, with throughput recorded.
Timing to host transfer (np.asarray), one fit-loop-free step loop.
"""
import sys, time
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


def synth(n, m, nnz, seed=0):
    rng = np.random.RandomState(seed)
    # Zipfian-ish vocabulary like real text
    p = 1.0 / np.arange(1, m + 1) ** 1.05
    p /= p.sum()
    rows = rng.randint(0, n, nnz).astype(np.int64)
    cols = rng.choice(m, size=nnz, p=p).astype(np.int64)
    vals = (1 + rng.poisson(1.2, nnz)).astype(np.float32)
    X = sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()
    X.sum_duplicates()
    return X


def bench_dense(X, k, iters=30):
    from enstop_tpu.ops.driver import prepare_counts
    from enstop_tpu.ops import pallas_em
    from enstop_tpu.ops.data import pad_factors
    from enstop_tpu.ops.init import plsa_init

    prep = prepare_counts(X, standardize=False)
    zd0, wz0 = plsa_init(X, k, rng=np.random.RandomState(1))
    zd, wz = pad_factors(zd0, wz0, prep.device_array.shape[0], prep.device_array.shape[1])
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)

    @jax.jit
    def step(X, zd, wz):
        return pallas_em.em_step_fused(X, zd, wz, compute_ll=False)

    z, w, _ = step(prep.device_array, zd, wz); _ = np.asarray(z)
    t0 = time.time()
    z, w = zd, wz
    for _ in range(iters):
        z, w, _ = step(prep.device_array, z, w)
    _ = np.asarray(z)
    dt = (time.time() - t0) / iters
    return dt


def bench_pallas_sparse(X, k, iters=30, bd=512, bw=512, chunk=None):
    from enstop_tpu.ops import pallas_sell as ps
    from enstop_tpu.ops.init import plsa_init

    t0 = time.time()
    ch = ps.pack_chunks(X, bd=bd, bw=bw, chunk=chunk)
    dev = ps.device_chunks(ch)
    pack_t = time.time() - t0
    waste = ch.word_major.rows_local.size / max(ch.nnz, 1)
    print(f"#  pack {pack_t:.1f}s, chunk={ch.chunk}, fill 1/{waste:.2f}", flush=True)
    zd, wz = plsa_init(X, k, rng=np.random.RandomState(1))
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)

    @jax.jit
    def step(dev, zd, wz):
        # dev passed as an ARG: closing over it would embed the chunk arrays
        # as constants in the HLO (hundreds of MB -> remote-compile 413s)
        return ps.em_step_chunks(dev, zd, wz, compute_ll=False, bd=bd, bw=bw,
                                 n_pad=ch.n_pad, m_pad=ch.m_pad)

    z, w, _ = step(dev, zd, wz); _ = np.asarray(z)
    t0 = time.time()
    z, w = zd, wz
    for _ in range(iters):
        z, w, _ = step(dev, z, w)
    _ = np.asarray(z)
    return (time.time() - t0) / iters


def bench_sparse(X, k, segsum, iters=30):
    from enstop_tpu.ops.sell import prepare_sell, em_step_sell
    from enstop_tpu.ops.init import plsa_init

    prep = prepare_sell(X, standardize=False, kind="sell",
                        build_tables=(segsum == "gather"))
    zd, wz = plsa_init(X, k, rng=np.random.RandomState(1))
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)

    @jax.jit
    def step(dev, zd, wz):
        # dev as an ARG, not a closure (closures embed GB-scale constants)
        return em_step_sell(dev, zd, wz, compute_ll=False, segsum=segsum)

    z, w, _ = step(prep.dev, zd, wz); _ = np.asarray(z)
    t0 = time.time()
    z, w = zd, wz
    for _ in range(iters):
        z, w, _ = step(prep.dev, z, w)
    _ = np.asarray(z)
    dt = (time.time() - t0) / iters
    return dt


def report(label, dt, nnz, k):
    print(f"{label:38s} {dt*1e3:8.2f} ms/iter  {nnz*k/dt/1e9:7.2f} Gupd/s",
          flush=True)


def main():
    print("# backend:", jax.default_backend(), flush=True)
    K = 20

    print("== A. 20NG shape (density 0.57%) ==", flush=True)
    X = synth(18846, 25000, 2_200_000)
    print(f"#  nnz={X.nnz}", flush=True)
    report("dense fused", bench_dense(X, K), X.nnz, K)
    report("sparse pallas chunks", bench_pallas_sparse(X, K), X.nnz, K)
    report("sparse SELL (scatter)", bench_sparse(X, K, "scatter"), X.nnz, K)

    print("== B. 10x sparser, 141k vocab (density 0.078%) ==", flush=True)
    X = synth(20000, 141000, 2_200_000)
    print(f"#  nnz={X.nnz}", flush=True)
    report("dense fused", bench_dense(X, K), X.nnz, K)
    report("sparse pallas chunks", bench_pallas_sparse(X, K), X.nnz, K)
    report("sparse SELL (scatter)", bench_sparse(X, K, "scatter"), X.nnz, K)

    print("== D. 30x sparser than 20NG: 20k x 500k vocab (density 0.016%) ==",
          flush=True)
    X = synth(20000, 500_000, 2_200_000)
    print(f"#  nnz={X.nnz}  dense-bf16-would-be={X.shape[0]*X.shape[1]*2/1e9:.0f} GB"
          " (> HBM: dense cannot run)", flush=True)
    report("sparse SELL (scatter)", bench_sparse(X, K, "scatter"), X.nnz, K)
    report("sparse SELL (gather)", bench_sparse(X, K, "gather"), X.nnz, K)

    print("== C. sparse-only scale: 250k x 141k, nnz 25M ==", flush=True)
    X = synth(250_000, 141_000, 25_000_000)
    print(f"#  nnz={X.nnz}  dense-bf16-would-be={X.shape[0]*X.shape[1]*2/1e9:.0f} GB",
          flush=True)
    report("sparse SELL (scatter)", bench_sparse(X, K, "scatter", iters=10), X.nnz, K)


if __name__ == "__main__":
    main()
