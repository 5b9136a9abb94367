"""Decompose the ensemble 'runs' stage wall time on the real chip.

VERDICT round-1 item 10 wants warm ensemble E2E <= 10 s on one chip; the
recorded 13.2 s spends 8.75 s in the 16 bootstrap fits whose device floor
(80 iters x ~3.4 ms) is ~4.3 s.  This experiment isolates where the rest
goes: host-side per-run work (multinomial weights, init dispatch, padding),
dispatch pipelining, convergence step counts, and the final topic readbacks.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import synthetic_20ng
    from enstop_tpu.ops.driver import prepare_counts, _build_fit_fn
    from enstop_tpu.ops.data import pad_vector, round_up

    print("# backend:", jax.default_backend(), file=sys.stderr, flush=True)
    X = synthetic_20ng()
    n, m = X.shape
    k, n_runs, n_iter = 20, 16, 80

    t0 = time.time()
    prepared = prepare_counts(X, standardize=False)
    print(f"# prepare_counts {time.time()-t0:.2f}s", file=sys.stderr, flush=True)
    Xdev = prepared.device_array
    n_pad, m_pad = Xdev.shape
    backend = prepared.backend

    run = _build_fit_fn(backend, n_iter, 10, True, False, "default")
    tol = jnp.float32(0.001)

    kp = round_up(k, 8)
    base_key = jax.random.PRNGKey(0)

    @jax.jit
    def make_init(key):
        kz, kw = jax.random.split(key)
        zd = jax.random.uniform(kz, (n_pad, kp), jnp.float32)
        zd = jnp.where((jnp.arange(n_pad) < n)[:, None]
                       & (jnp.arange(kp) < k)[None, :], zd, 0.0)
        zd = zd / jnp.maximum(zd.sum(1, keepdims=True), 1e-30)
        wz = jax.random.uniform(kw, (kp, m_pad), jnp.float32)
        wz = jnp.where((jnp.arange(kp) < k)[:, None]
                       & (jnp.arange(m_pad) < m)[None, :], wz, 0.0)
        wz = wz / jnp.maximum(wz.sum(1, keepdims=True), 1e-30)
        return zd, wz

    rng = np.random.RandomState(42)
    uniform = np.full(n, 1.0 / n)

    # ---- compile warmup (exactly the production programs) -------------------
    t0 = time.time()
    zd0, wz0 = make_init(base_key)
    w0 = pad_vector(np.ones(n, np.float32), n_pad)
    out = run.full(Xdev, zd0, wz0, w0, tol)
    np.asarray(out[1])
    print(f"# warmup(compile) {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    # ---- host-component costs, measured alone --------------------------------
    t0 = time.time()
    for i in range(n_runs):
        rng.multinomial(n, uniform).astype(np.float32)
    t_multi = time.time() - t0
    t0 = time.time()
    for i in range(n_runs):
        pad_vector(rng.multinomial(n, uniform).astype(np.float32), n_pad)
    t_multi_pad = time.time() - t0
    t0 = time.time()
    inits = [make_init(jax.random.fold_in(base_key, i)) for i in range(n_runs)]
    np.asarray(inits[-1][1])  # sync to a host transfer (block_until_ready lies here)
    t_init_dispatch = time.time() - t0
    print(f"host: multinomial x16 {t_multi:.2f}s  +pad {t_multi_pad:.2f}s  "
          f"make_init x16 dispatch {t_init_dispatch:.2f}s",
          flush=True)

    # ---- device floor: everything pre-staged, dispatch 16, one sync ---------
    ws = [pad_vector(rng.multinomial(n, uniform).astype(np.float32), n_pad)
          for _ in range(n_runs)]
    ws = [jax.device_put(w) for w in ws]
    inits = [make_init(jax.random.fold_in(base_key, 100 + i)) for i in range(n_runs)]
    np.asarray(inits[-1][0])  # drain the init queue before starting the clock
    t0 = time.time()
    pend = [run.full(Xdev, zd, wz, w, tol) for (zd, wz), w in zip(inits, ws)]
    steps = [int(np.asarray(p[2])) for p in pend]
    t_sync_steps = time.time() - t0
    topics = [np.asarray(p[1])[:k, :m] for p in pend]
    t_floor = time.time() - t0
    print(f"device floor (pre-staged): all-steps-sync {t_sync_steps:.2f}s  "
          f"+topic readback {t_floor:.2f}s  steps={steps}", flush=True)

    # ---- production-shaped loop (host work interleaved) ----------------------
    t0 = time.time()
    pending = []
    for i in range(n_runs):
        zd, wz = make_init(jax.random.fold_in(base_key, 200 + i))
        w = pad_vector(rng.multinomial(n, uniform).astype(np.float32), n_pad)
        pending.append(run.full(Xdev, zd, wz, w, tol))
    t_dispatch_loop = time.time() - t0
    all_topics = np.vstack([np.asarray(p[1])[:k, :m] for p in pending])
    t_prod = time.time() - t0
    print(f"production loop: dispatch {t_dispatch_loop:.2f}s  "
          f"total(+readback) {t_prod:.2f}s  shape={all_topics.shape}", flush=True)

    # readback size accounting
    one = np.asarray(pending[0][1])
    print(f"per-run readback array: {one.shape} {one.dtype} "
          f"{one.nbytes/1e6:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
