"""D+C sparse-only workloads (see bench_sparse.py)."""
import sys
sys.path.insert(0, ".")
from bench_sparse import synth, bench_sparse, report
import jax

# dead-relay guard: a hung tunnel makes every device op block forever
import bench as _bench

if not _bench._device_responsive(180):  # short budget: stay under the 600 s task cap
    print("# device backend unresponsive; skipping (TPU-only measurement)",
          file=sys.stderr, flush=True)
    sys.exit(0)


def main():
    print("# backend:", jax.default_backend(), flush=True)
    K = 20
    print("== D. 30x sparser than 20NG: 20k x 500k vocab ==", flush=True)
    X = synth(20000, 500_000, 2_200_000)
    print(f"#  nnz={X.nnz}  dense-bf16-would-be={X.shape[0]*X.shape[1]*2/1e9:.0f} GB (> HBM)", flush=True)
    report("sparse SELL (scatter)", bench_sparse(X, K, "scatter"), X.nnz, K)
    print("== C. 250k x 141k, nnz 19M (dense 70 GB) ==", flush=True)
    X = synth(250_000, 141_000, 25_000_000)
    print(f"#  nnz={X.nnz}", flush=True)
    report("sparse SELL (scatter)", bench_sparse(X, K, "scatter", iters=10), X.nnz, K)

if __name__ == "__main__":
    main()
