"""Find the sparse SELL scale ceiling under this remote compiler."""
import sys, time
sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
import numpy as np
from bench_sparse import synth, bench_sparse, report
import jax

def main():
    print("# backend:", jax.default_backend(), flush=True)
    K = 20
    for (n, m, nnz) in ((100_000, 141_000, 8_000_000),
                        (250_000, 141_000, 25_000_000)):
        X = synth(n, m, nnz)
        print(f"== {n}x{m}, nnz={X.nnz}, dense-bf16 {n*m*2/1e9:.0f} GB ==", flush=True)
        try:
            report("sparse SELL (scatter)", bench_sparse(X, K, "scatter", iters=10), X.nnz, K)
        except Exception as e:
            print("#  FAILED:", type(e).__name__, str(e)[:120], flush=True)

if __name__ == "__main__":
    main()
