"""Quantify the ensemble's e_step_thresh=1e-16 deviation at 20NG scale
(VERDICT round-2 item 4: "ensemble fits either honor 1e-16 or ship a
quantified statement").

Fits the 20NG-shaped corpus twice on the sparse backend with identical init —
once with the exact 1e-16 cutoff (the reference ensemble's semantics,
enstop_.py:100,112,432) and once without — and reports how far the factors and
log-likelihood diverge, plus how many products actually fall below 1e-16 at
convergence.  The result backs the fast dense kernel's decision to skip the
cutoff (documented in docs/PERFORMANCE.md).
"""
import json
import sys

sys.path.insert(0, ".")
import numpy as np

def main():
    import jax
    from enstop_tpu.ops.init import plsa_init
    from enstop_tpu.ops.sell import prepare_sell, sell_fit

    print("# backend:", jax.default_backend(), file=sys.stderr, flush=True)
    if jax.default_backend() == "tpu":
        from bench import synthetic_20ng

        X = synthetic_20ng()
        n_iter = 100
    else:
        from enstop_tpu.synthetic import synthetic_corpus

        X, _ = synthetic_corpus(n_docs=3000, n_words=5000, n_topics=20,
                                tokens_per_doc=60, seed=0)
        n_iter = 60
    k = 20
    pzd0, pwz0 = plsa_init(X, k, rng=np.random.RandomState(1))
    prep = prepare_sell(X, standardize=False)

    out = {}
    factors = {}
    for label, thresh in (("no_thresh", 1e-32), ("thresh_1e16", 1e-16)):
        zd, wz, steps, ll, trace, ntests = sell_fit(
            prep, pzd0, pwz0, n_iter=n_iter, n_iter_per_test=10,
            tolerance=0.001, e_step_thresh=thresh,
        )
        factors[label] = (np.asarray(zd), np.asarray(wz))
        out[label] = {"steps": int(steps), "final_ll": float(ll)}
        print(f"# {label}: steps={int(steps)} ll={float(ll):.1f}",
              file=sys.stderr, flush=True)

    zd_a, wz_a = factors["no_thresh"]
    zd_b, wz_b = factors["thresh_1e16"]
    out["deviation"] = {
        "max_abs_wz": float(np.abs(wz_a - wz_b).max()),
        "max_abs_zd": float(np.abs(zd_a - zd_b).max()),
        "rel_ll": abs(out["no_thresh"]["final_ll"] - out["thresh_1e16"]["final_ll"])
                  / abs(out["no_thresh"]["final_ll"]),
    }

    # how often does the cutoff actually fire at the (unthresholded) optimum?
    rng = np.random.RandomState(0)
    from scipy.sparse import issparse
    Xc = X.tocoo() if issparse(X) else None
    idx = rng.choice(Xc.nnz, size=min(200_000, Xc.nnz), replace=False)
    r, c = Xc.row[idx], Xc.col[idx]
    prods = (zd_a[r, :] * wz_a[:, c].T).astype(np.float32)  # (S, k) per-topic products
    nonzero = prods > 0
    fired = (prods <= 1e-16) & nonzero
    out["cutoff_fire_rate_at_optimum"] = float(fired.sum() / max(nonzero.sum(), 1))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
