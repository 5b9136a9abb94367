"""Real-TPU smoke of every dense fused-kernel variant."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from enstop_tpu.ops import pallas_em
from enstop_tpu.ops.data import round_up

def main():
    print("# backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    bd, bw = 512, 1024
    n, m, k = 2048, 3072, 9
    kp = round_up(k, 8)
    X = np.zeros((n, m), np.float32)
    np.add.at(X, (rng.randint(0, n, 50000), rng.randint(0, m, 50000)), 1.0)
    zd = rng.rand(n, kp).astype(np.float32); zd[:, k:] = 0
    zd /= np.maximum(zd.sum(1, keepdims=True), 1e-30)
    wz = rng.rand(kp, m).astype(np.float32); wz[k:] = 0
    wz /= np.maximum(wz.sum(1, keepdims=True), 1e-30)
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)
    Xb = jnp.asarray(X, jnp.bfloat16)
    Xf = jnp.asarray(X)
    zdj, wzj = jnp.asarray(zd), jnp.asarray(wz)

    for Xj, xlabel in ((Xb, "bf16"), (Xf, "f32")):
        for prec in ("default", "highest"):
            for ll in (False, True):
                z, v, l = pallas_em.em_step_fused(Xj, zdj, wzj, sample_weight=w,
                                                  compute_ll=ll, precision=prec)
                ok = np.isfinite(np.asarray(z)).all()
                print(f"em   x={xlabel} prec={prec} ll={ll}: finite={ok} ll={float(l):.1f}",
                      flush=True)
                z2, l2 = pallas_em.refit_step_fused(Xj, zdj, wzj, sample_weight=w,
                                                    compute_ll=ll, precision=prec)
                print(f"refit x={xlabel} prec={prec} ll={ll}: finite="
                      f"{np.isfinite(np.asarray(z2)).all()} ll={float(l2):.1f}",
                      flush=True)
        l3 = pallas_em.log_likelihood_fused(Xj, zdj, wzj, sample_weight=w)
        print(f"ll   x={xlabel}: {float(l3):.1f}", flush=True)

    # batched multi-run kernel (round-1, kept with parity tests)
    try:
        from enstop_tpu.ops import pallas_batch
        have = hasattr(pallas_batch, "em_step_batched")
        print("pallas_batch symbols:", [s for s in dir(pallas_batch) if "step" in s or "fused" in s], flush=True)
    except Exception as e:
        print("pallas_batch:", e, flush=True)

if __name__ == "__main__":
    main()
