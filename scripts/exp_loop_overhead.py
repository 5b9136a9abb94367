"""Where do 2 ms/iter go between the bare kernel and the bench loop?"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from enstop_tpu.ops.driver import _get_steps, prepare_counts
from enstop_tpu.ops.data import pad_factors, pad_vector
from enstop_tpu.ops.init import plsa_init

def main():
    print("# backend:", jax.default_backend(), flush=True)
    X = sp.load_npz("/tmp/enstop_bench_corpus_0.npz").tocsr()
    prep = prepare_counts(X)
    em_step, _, ll_fn, em_step_ll = _get_steps("pallas", precision="default")
    Xd = prep.device_array
    pzd0, pwz0 = plsa_init(X, 20, rng=np.random.RandomState(1))
    zd, wz = pad_factors(pzd0, pwz0, Xd.shape[0], Xd.shape[1])
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)
    w = jnp.asarray(pad_vector(np.ones(X.shape[0], np.float32), Xd.shape[0]))

    # (a) bare chained dispatches, no weights
    @jax.jit
    def bare(X, zd, wz):
        z, v, _ = em_step(X, zd, wz, sample_weight=None)
        return z, v
    z, v = bare(Xd, zd, wz); _ = np.asarray(z)
    t0 = time.time(); z, v = zd, wz
    for _ in range(40): z, v = bare(Xd, z, v)
    _ = np.asarray(z); print(f"(a) bare no-w      : {(time.time()-t0)/40*1e3:6.2f} ms/iter", flush=True)

    # (b) bare with weights (the bench/ensemble path always passes w)
    @jax.jit
    def bare_w(X, zd, wz, w):
        z, v, _ = em_step(X, zd, wz, sample_weight=w)
        return z, v
    z, v = bare_w(Xd, zd, wz, w); _ = np.asarray(z)
    t0 = time.time(); z, v = zd, wz
    for _ in range(40): z, v = bare_w(Xd, z, v, w)
    _ = np.asarray(z); print(f"(b) bare with w    : {(time.time()-t0)/40*1e3:6.2f} ms/iter", flush=True)

    # (c) fori_loop chunk of 10 (no LL)
    @jax.jit
    def chunk10(X, zd, wz, w):
        def body(_, s):
            z, v, _ = em_step(X, s[0], s[1], sample_weight=w)
            return (z, v)
        return jax.lax.fori_loop(0, 10, body, (zd, wz))
    z, v = chunk10(Xd, zd, wz, w); _ = np.asarray(z)
    t0 = time.time(); z, v = zd, wz
    for _ in range(4): z, v = chunk10(Xd, z, v, w)
    _ = np.asarray(z); print(f"(c) fori chunk10   : {(time.time()-t0)/40*1e3:6.2f} ms/iter", flush=True)

    # (d) fori chunk10 with donation
    @jax.jit
    def chunk10d(X, zd, wz, w):
        def body(_, s):
            z, v, _ = em_step(X, s[0], s[1], sample_weight=w)
            return (z, v)
        return jax.lax.fori_loop(0, 10, body, (zd, wz))
    chunk10d2 = jax.jit(chunk10d.__wrapped__, donate_argnums=(1, 2))
    z, v = chunk10d2(Xd, jnp.array(zd), jnp.array(wz), w); _ = np.asarray(z)
    t0 = time.time()
    for _ in range(4): z, v = chunk10d2(Xd, z, v, w)
    _ = np.asarray(z); print(f"(d) chunk10 donate : {(time.time()-t0)/40*1e3:6.2f} ms/iter", flush=True)

    # (e) the LL-folded boundary step alone
    @jax.jit
    def bound(X, zd, wz, w):
        z, v, ll = em_step_ll(X, zd, wz, sample_weight=w)
        return z, v, ll
    z, v, l = bound(Xd, zd, wz, w); _ = np.asarray(z)
    t0 = time.time(); z, v = zd, wz
    for _ in range(40): z, v, l = bound(Xd, z, v, w)
    _ = np.asarray(z); print(f"(e) LL-folded step : {(time.time()-t0)/40*1e3:6.2f} ms/iter", flush=True)

if __name__ == "__main__":
    main()
