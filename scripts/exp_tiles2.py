"""Mask-free kernel taller-tile sweep, then 3x bench.py for variance."""
import subprocess, sys, time
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from enstop_tpu.ops import pallas_em
from enstop_tpu.ops.data import round_up

N_DOCS, N_WORDS, K, NNZ = 18846, 25000, 20, 2200000

def make_inputs(bd, bw):
    rng = np.random.RandomState(0)
    npad, mpad = round_up(N_DOCS, bd), round_up(N_WORDS, bw)
    kp = round_up(K, 8)
    X = np.zeros((npad, mpad), np.float32)
    ridx = rng.randint(0, N_DOCS, NNZ); cidx = rng.randint(0, N_WORDS, NNZ)
    np.add.at(X, (ridx, cidx), 1.0 + rng.poisson(1.5, NNZ))
    zd = rng.rand(npad, kp).astype(np.float32); zd[N_DOCS:] = 0; zd[:, K:] = 0
    zd /= np.maximum(zd.sum(1, keepdims=True), 1e-30)
    wz = rng.rand(kp, mpad).astype(np.float32); wz[K:] = 0; wz[:, N_WORDS:] = 0
    wz /= np.maximum(wz.sum(1, keepdims=True), 1e-30)
    return jnp.asarray(X, jnp.bfloat16), jnp.asarray(zd), jnp.asarray(wz)

def main():
    print("# backend:", jax.default_backend(), flush=True)
    for (bd, bw) in ((512, 1024), (1024, 512), (1024, 1024), (1024, 2048), (2048, 512)):
        X, zd, wz = make_inputs(bd, bw)
        import functools
        @jax.jit
        def step(X, zd, wz, bd=bd, bw=bw):
            return pallas_em.em_step_fused(X, zd, wz, bd=bd, bw=bw, compute_ll=False)
        z, w, _ = step(X, zd, wz); _ = np.asarray(z)
        for trial in range(2):
            t0 = time.time()
            z, w = zd, wz
            for _ in range(40):
                z, w, _ = step(X, z, w)
            _ = np.asarray(z)
            dt = (time.time() - t0) / 40
            print(f"bd={bd} bw={bw} trial{trial}: {dt*1e3:6.3f} ms/iter", flush=True)

    for i in range(3):
        out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                             text=True, timeout=900)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(f"bench run {i}:", line[-1] if line else out.stderr[-200:], flush=True)

if __name__ == "__main__":
    main()
