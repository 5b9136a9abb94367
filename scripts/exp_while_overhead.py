"""Which part of the while-loop fit program costs ~3 ms/iter?"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax import lax

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
    zd0, wz0 = pad_factors(pzd0, pwz0, Xd.shape[0], Xd.shape[1])
    zd0, wz0 = jnp.asarray(zd0), jnp.asarray(wz0)
    w = jnp.asarray(pad_vector(np.ones(X.shape[0], np.float32), Xd.shape[0]))

    def timeit(fn, label, n_iters=100, reps=2):
        out = fn(); _ = np.asarray(out[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.time(); out = fn(); _ = np.asarray(out[0])
            best = min(best, time.time() - t0)
        print(f"{label:42s}: {best/n_iters*1e3:6.2f} ms/iter ({best:.3f}s)", flush=True)

    # (1) one jit: plain fori of 100 steps, nothing else
    @jax.jit
    def fori100(X, zd, wz, w):
        def body(_, s):
            z, v, _ = em_step(X, s[0], s[1], sample_weight=w)
            return (z, v)
        return lax.fori_loop(0, 100, body, (zd, wz))
    timeit(lambda: fori100(Xd, zd0, wz0, w), "(1) jit fori100 plain")

    # (2) while_loop of 10 chunks x fori10, no LL/trace
    @jax.jit
    def while_chunks(X, zd, wz, w):
        def cond(c): return c[2] < 10
        def body(c):
            zd, wz, i = c
            def inner(_, s):
                z, v, _ = em_step(X, s[0], s[1], sample_weight=w)
                return (z, v)
            zd, wz = lax.fori_loop(0, 10, inner, (zd, wz))
            return (zd, wz, i + 1)
        return lax.while_loop(cond, body, (zd, wz, jnp.int32(0)))
    timeit(lambda: while_chunks(Xd, zd0, wz0, w), "(2) while(10 x fori10) plain")

    # (3) while chunks with TRACED trip counts (like em_fit_loop)
    @jax.jit
    def while_traced(X, zd, wz, w, n_iter, npt):
        def cond(c): return c[2] < n_iter
        def body(c):
            zd, wz, done = c
            nxt = jnp.minimum(n_iter, done + npt)
            def inner(_, s):
                z, v, _ = em_step(X, s[0], s[1], sample_weight=w)
                return (z, v)
            zd, wz = lax.fori_loop(0, nxt - done, inner, (zd, wz))
            return (zd, wz, nxt)
        return lax.while_loop(cond, body, (zd, wz, jnp.int32(0)))
    timeit(lambda: while_traced(Xd, zd0, wz0, w, jnp.int32(100), jnp.int32(10)),
           "(3) while traced-trip fori")

    # (4) the full folded fit loop (what plsa_fit runs)
    from enstop_tpu.ops.fit import em_fit_loop_folded

    @jax.jit
    def full(X, zd, wz, w):
        def step(s):
            z, v, ll = em_step(X, s[0], s[1], sample_weight=w)
            return (z, v), ll
        def step_ll(s):
            z, v, ll = em_step_ll(X, s[0], s[1], sample_weight=w)
            return (z, v), ll
        def ll_of(s):
            return ll_fn(X, s[0], s[1], sample_weight=w)
        res = em_fit_loop_folded(step_ll, step, ll_of, (zd, wz),
                                 jnp.int32(100), jnp.int32(10), jnp.float32(0.0))
        return res.state[0], res.state[1]
    timeit(lambda: full(Xd, zd0, wz0, w), "(4) em_fit_loop_folded full")

if __name__ == "__main__":
    main()
