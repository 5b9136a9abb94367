"""Dense fused kernel at the BASELINE envelope's larger topic counts."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from enstop_tpu.ops import pallas_em
from enstop_tpu.ops.data import round_up

def run(k, bd, bw, n=18846, m=25000, nnz=2_200_000):
    rng = np.random.RandomState(0)
    npad, mpad = round_up(n, bd), round_up(m, bw)
    kp = round_up(k, 8)
    X = np.zeros((npad, mpad), np.float32)
    np.add.at(X, (rng.randint(0, n, nnz), rng.randint(0, m, nnz)), 1.0)
    zd = rng.rand(npad, kp).astype(np.float32); zd[n:] = 0; zd[:, k:] = 0
    zd /= np.maximum(zd.sum(1, keepdims=True), 1e-30)
    wz = rng.rand(kp, mpad).astype(np.float32); wz[k:] = 0; wz[:, m:] = 0
    wz /= np.maximum(wz.sum(1, keepdims=True), 1e-30)
    Xj = jnp.asarray(X, jnp.bfloat16); zdj = jnp.asarray(zd); wzj = jnp.asarray(wz)

    @jax.jit
    def step(X, zd, wz):
        return pallas_em.em_step_fused(X, zd, wz, bd=bd, bw=bw, compute_ll=False)
    try:
        z, v, _ = step(Xj, zdj, wzj); _ = np.asarray(z)
    except Exception as e:
        print(f"k={k:4d} bd={bd} bw={bw}: FAILED {type(e).__name__} {str(e)[:80]}",
              flush=True)
        return
    t0 = time.time(); z, v = zdj, wzj
    for _ in range(20): z, v, _ = step(Xj, z, v)
    _ = np.asarray(z)
    dt = (time.time() - t0) / 20
    print(f"k={k:4d} bd={bd} bw={bw}: {dt*1e3:7.2f} ms/iter "
          f"({nnz*k/dt/1e9:6.1f} Gupd/s)", flush=True)

def main():
    print("# backend:", jax.default_backend(), flush=True)
    for k in (20, 100, 200):
        for (bd, bw) in ((512, 1024), (1024, 512)):
            run(k, bd, bw)

if __name__ == "__main__":
    main()
