"""Micro-benchmark: fused Pallas EM step variants vs XLA dense EM at 20NG scale."""
import sys, time
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from enstop_tpu.ops import em as em_ops, pallas_em
from enstop_tpu.ops.data import round_up


def make_inputs(n_docs, n_words, k, nnz_target, x_dtype=np.float32, bd=None, bw=None):
    rng = np.random.RandomState(0)
    bd, bw = pallas_em.pick_block_shape(n_docs, n_words, bd, bw)
    npad, mpad = round_up(n_docs, bd), round_up(n_words, bw)
    kp = round_up(k, 8)
    X = np.zeros((npad, mpad), np.float32)
    ridx = rng.randint(0, n_docs, nnz_target)
    cidx = rng.randint(0, n_words, nnz_target)
    np.add.at(X, (ridx, cidx), rng.poisson(2, nnz_target).astype(np.float32) + 1)
    zd0 = rng.rand(npad, kp).astype(np.float32)
    zd0[n_docs:] = 0; zd0[:, k:] = 0
    zd0 /= np.maximum(zd0.sum(1, keepdims=True), 1e-30)
    wz0 = rng.rand(kp, mpad).astype(np.float32)
    wz0[k:] = 0; wz0[:, n_words:] = 0
    wz0 /= np.maximum(wz0.sum(1, keepdims=True), 1e-30)
    return jnp.asarray(X.astype(x_dtype)), jnp.asarray(zd0), jnp.asarray(wz0), bd, bw


def bench(fn, Xj, zdj, wzj, label, nnz, k, iters=30):
    t0 = time.time()
    z, w2, ll = fn(Xj, zdj, wzj)
    jax.block_until_ready(z)
    compile_t = time.time() - t0
    z, w = zdj, wzj
    t0 = time.time()
    for _ in range(iters):
        z, w, ll = fn(Xj, z, w)
    jax.block_until_ready(z)
    dt = (time.time() - t0) / iters
    xbytes = Xj.size * Xj.dtype.itemsize
    print(
        f"{label:42s}: {dt*1e3:7.2f} ms/iter  {nnz*k/dt/1e9:6.1f} Gupd/s  "
        f"X-stream {xbytes/dt/1e9:5.0f} GB/s  (compile {compile_t:.1f}s)",
        flush=True,
    )
    return dt


def main():
    n_docs, n_words, k, nnz = 18846, 25000, 20, 2_200_000
    Xj, zdj, wzj, bd, bw = make_inputs(n_docs, n_words, k, nnz)
    print(f"X {Xj.size*4/1e6:.0f} MB  blocks {bd}x{bw}  backend {jax.default_backend()}", flush=True)

    variants = [
        ("fused ll=T prec=highest", dict(compute_ll=True, precision="highest")),
        ("fused ll=F prec=highest", dict(compute_ll=False, precision="highest")),
        ("fused ll=F prec=default", dict(compute_ll=False, precision="default")),
    ]
    for label, kw in variants:
        fn = lambda X, z, w, kw=kw: pallas_em.em_step_fused(X, z, w, **kw)
        bench(fn, Xj, zdj, wzj, label, nnz, k)

    # bf16 X storage
    Xb = Xj.astype(jnp.bfloat16)
    fn = lambda X, z, w: pallas_em.em_step_fused(X, z, w, compute_ll=False, precision="highest")
    bench(fn, Xb, zdj, wzj, "fused ll=F prec=highest bf16-X", nnz, k)

    # block size variants
    for (tbd, tbw) in [(256, 512), (1024, 512), (512, 1024), (256, 1024), (1024, 256)]:
        try:
            Xj2, zdj2, wzj2, _, _ = make_inputs(n_docs, n_words, k, nnz, bd=tbd, bw=tbw)
            fn = lambda X, z, w: pallas_em.em_step_fused(
                X, z, w, bd=tbd, bw=tbw, compute_ll=False, precision="highest")
            bench(fn, Xj2, zdj2, wzj2, f"fused ll=F blocks {tbd}x{tbw}", nnz, k)
        except Exception as e:
            print(f"blocks {tbd}x{tbw} failed: {type(e).__name__}", flush=True)

    bench(em_ops.em_step_dense, Xj, zdj, wzj, "xla-dense", nnz, k, iters=10)


if __name__ == "__main__":
    main()
