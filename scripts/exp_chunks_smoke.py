"""Real-TPU smoke of every pallas_sell kernel variant (refit/thresh/weighted/LL)."""
import sys
sys.path.insert(0, ".")
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from enstop_tpu.ops import pallas_sell as ps
from enstop_tpu.ops import coo as coo_ops

def main():
    print("# backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    X = sp.random(3000, 4000, density=0.01, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 4).astype(np.float32)
    X = sp.csr_matrix(X)
    ch = ps.pack_chunks(X)
    dev = ps.device_chunks(ch)
    k = 7
    zd = rng.rand(3000, k).astype(np.float32); zd /= zd.sum(1, keepdims=True)
    wz = rng.rand(k, 4000).astype(np.float32); wz /= wz.sum(1, keepdims=True)
    w = rng.uniform(0.3, 2.0, 3000).astype(np.float32)
    zd_j, wz_j, w_j = jnp.asarray(zd), jnp.asarray(wz), jnp.asarray(w)

    Xc = X.tocoo()
    def coo_ref(thresh, weighted):
        return coo_ops.em_step_coo(
            jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
            zd_j, wz_j, 3000, 4000,
            sample_weight=w_j if weighted else None,
            probability_threshold=thresh)

    for thresh, weighted, label in ((None, False, "plain"),
                                    (None, True, "weighted"),
                                    (1e-4, True, "thresh+weighted")):
        z, v, ll = ps.em_step_chunks(dev, zd_j, wz_j,
                                     w=w_j if weighted else None,
                                     thresh=thresh, bd=ch.bd, bw=ch.bw,
                                     n_pad=ch.n_pad, m_pad=ch.m_pad)
        z1, v1, ll1 = coo_ref(thresh if thresh else 1e-32, weighted)
        ok = (np.allclose(np.asarray(z), np.asarray(z1), rtol=1e-3, atol=1e-5)
              and np.allclose(np.asarray(v), np.asarray(v1), rtol=1e-3, atol=1e-5))
        print(f"em {label:16s}: parity(1e-3)={ok} ll={float(ll):.1f}/{float(ll1):.1f}",
              flush=True)

    z, ll = ps.refit_step_chunks(dev, zd_j, wz_j, w=w_j, bd=ch.bd, bw=ch.bw,
                                 n_pad=ch.n_pad, m_pad=ch.m_pad)
    print(f"refit: finite={np.isfinite(np.asarray(z)).all()} ll={float(ll):.1f}",
          flush=True)
    llo = ps.log_likelihood_chunks(dev, zd_j, wz_j, w=w_j, bd=ch.bd, bw=ch.bw,
                                   n_pad=ch.n_pad, m_pad=ch.m_pad)
    print(f"ll kernel: {float(llo):.1f}", flush=True)

    # the fit-driver integration (kind='chunks') on TPU
    from enstop_tpu.ops.sell import prepare_sell, sell_fit
    prep = prepare_sell(X, standardize=False, kind="chunks")
    zf, vf, steps, fll, tr, nt = sell_fit(prep, zd, wz, n_iter=5,
                                          n_iter_per_test=2)
    print(f"chunks fit: steps={int(steps)} ll={float(fll):.1f} "
          f"finite={np.isfinite(np.asarray(vf)).all()}", flush=True)

if __name__ == "__main__":
    main()
