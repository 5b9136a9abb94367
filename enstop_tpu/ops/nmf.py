"""Non-negative matrix factorization: host-side init helper + TPU-native MU solver.

Two roles (mirroring the reference's sklearn-NMF usage):

* ``nmf_frobenius_init`` — the quick Frobenius NMF used for pLSA ``init="nmf"``
  (reference plsa.py:495-504 calls sklearn's coordinate-descent solver; we do the
  same — it is a one-shot host-side initialization).

* ``nmf_fit_mu`` — a TPU-native multiplicative-update NMF for the ensemble's
  ``model="nmf"`` backend (reference enstop_.py:118-161 uses sklearn
  ``NMF(solver="mu", beta_loss=1)``).  KL-divergence MU updates share the exact
  matmul structure of the pLSA EM step:

      WH   = W @ H                     (only needed at nonzeros of X)
      R    = X / WH
      W   <- W * (R @ H^T) / rowsum(H^T)     [beta_loss=1, KL]
      H   <- H * (W^T @ R) / colsum(W)

  so on TPU it rides the same MXU-shaped pipeline as pLSA.  Frobenius MU
  (beta_loss=2) is also provided.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.utils import check_random_state

from .data import pad_dense_counts, round_up

_TINY = 1e-30


def nmf_frobenius_init(X, k, rng):
    """Quick Frobenius NMF used as a pLSA initializer (reference plsa.py:495-504)."""
    from sklearn.decomposition import non_negative_factorization

    W, H, _ = non_negative_factorization(
        X,
        n_components=k,
        init="nndsvd",
        solver="cd",
        beta_loss=2,
        tol=1e-2,
        max_iter=100,
        random_state=rng,
    )
    return W, H


def _mu_step_kl(X, W, H, l1_reg, l2_reg):
    """One KL-loss multiplicative update for both factors (W then H, like
    sklearn's mu solver which alternates W/H per iteration).

    ``l1_reg``/``l2_reg`` enter the update denominators exactly as in sklearn's
    ``_multiplicative_update_w``/``_h`` (denominator ``+= l1`` and ``+= l2*W``)
    — the reference passes a single unscaled ``alpha`` applied to both factors
    (enstop_.py:137-154 with pre-1.0 sklearn semantics)."""
    WH = jnp.maximum(jnp.dot(W, H, preferred_element_type=jnp.float32), _TINY)
    R = jnp.where(X > 0, X / WH, 0.0)
    # W update
    numW = jax.lax.dot_general(R, H, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (n, k)
    denomW = H.sum(axis=1)[None, :] + l1_reg + l2_reg * W  # (n, k) broadcast
    W = W * numW / jnp.maximum(denomW, _TINY)
    # H update (recompute WH with the fresh W)
    WH = jnp.maximum(jnp.dot(W, H, preferred_element_type=jnp.float32), _TINY)
    R = jnp.where(X > 0, X / WH, 0.0)
    numH = jax.lax.dot_general(W, R, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (k, m)
    denomH = W.sum(axis=0)[:, None] + l1_reg + l2_reg * H  # (k, m) broadcast
    H = H * numH / jnp.maximum(denomH, _TINY)
    return W, H


def _mu_step_frobenius(X, W, H, l1_reg, l2_reg):
    WH = jnp.dot(W, H, preferred_element_type=jnp.float32)
    numW = jax.lax.dot_general(X, H, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    denW = jax.lax.dot_general(WH, H, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    denW = denW + l1_reg + l2_reg * W
    W = W * numW / jnp.maximum(denW, _TINY)
    WH = jnp.dot(W, H, preferred_element_type=jnp.float32)
    numH = jax.lax.dot_general(W, X, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    denH = jax.lax.dot_general(W, WH, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    denH = denH + l1_reg + l2_reg * H
    H = H * numH / jnp.maximum(denH, _TINY)
    return W, H


@lru_cache(maxsize=16)
def _build_mu_loop(beta_loss, update_H):
    step = _mu_step_kl if beta_loss in (1, "kullback-leibler") else _mu_step_frobenius

    @jax.jit
    def run(X, W, H, n_iter, l1_reg, l2_reg):
        def body(_, carry):
            W, H = carry
            W2, H2 = step(X, W, H, l1_reg, l2_reg)
            if not update_H:
                H2 = H
            return (W2, H2)

        # n_iter and regs are traced: one compiled program per (beta_loss, update_H)
        return jax.lax.fori_loop(0, n_iter, body, (W, H))

    from ..aot_cache import maybe_wrap

    return maybe_wrap(run, name=f"nmf-mu-{beta_loss}-{int(update_H)}")


def nmf_fit_mu(
    X,
    k,
    beta_loss=1,
    n_iter=200,
    init="nndsvd",
    update_H=True,
    H_init=None,
    alpha=0.0,
    l1_ratio=0.0,
    random_state=None,
):
    """TPU-native NMF via multiplicative updates on the dense-padded layout.

    With ``update_H=False`` and ``H_init`` given, solves only for ``W`` against
    frozen components (the ensemble's final-embedding path, enstop_.py:571-580).

    ``alpha``/``l1_ratio`` follow the reference's (pre-1.0 sklearn) semantics:
    one unscaled constant regularizing both factors, split into
    ``l1 = alpha*l1_ratio`` and ``l2 = alpha*(1-l1_ratio)`` terms that enter the
    MU denominators (enstop_.py:137-154).
    """
    rng = check_random_state(random_state)
    Xd, n, m = pad_dense_counts(X, row_multiple=8, col_multiple=128)

    if H_init is not None:
        H0 = np.asarray(H_init, dtype=np.float32)
        W0 = np.abs(rng.rand(n, k)).astype(np.float32)
    elif isinstance(init, (tuple, list)):
        W0 = np.asarray(init[0], dtype=np.float32)
        H0 = np.asarray(init[1], dtype=np.float32)
    elif init == "nndsvd":
        from .init import nndsvd_init

        W0, H0 = nndsvd_init(X, k, rng)
        # MU updates cannot escape exact zeros; sklearn uses tiny eps fill too
        W0 = np.maximum(W0, 1e-8).astype(np.float32)
        H0 = np.maximum(H0, 1e-8).astype(np.float32)
    else:
        W0 = np.abs(rng.rand(n, k)).astype(np.float32)
        H0 = np.abs(rng.rand(k, m)).astype(np.float32)

    kp = round_up(k, 8)
    Wp = np.zeros((Xd.shape[0], kp), np.float32)
    Wp[:n, :k] = W0
    Hp = np.zeros((kp, Xd.shape[1]), np.float32)
    Hp[:k, :m] = H0[:, :m] if H0.shape[1] == m else H0

    l1_reg = float(alpha) * float(l1_ratio)
    l2_reg = float(alpha) * (1.0 - float(l1_ratio))
    run = _build_mu_loop(beta_loss if beta_loss in (1, 2) else 1, bool(update_H))
    W, H = run(Xd, Wp, Hp, jnp.int32(n_iter),
               jnp.float32(l1_reg), jnp.float32(l2_reg))
    return np.asarray(W)[:n, :k], np.asarray(H)[:k, :m]
