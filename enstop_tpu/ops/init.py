"""Factor initialization for pLSA / NMF (reference: plsa.py:412-513).

Supports ``"random"``, ``"nndsvd"`` (randomized SVD + positive/negative sign split),
``"nmf"`` (a quick Frobenius NMF), and user-supplied ``(P(z|d), P(w|z))`` tuples.
Both factors are l1-row/column normalized on the way out (plsa.py:510-511).

Initialization is a one-shot host-side computation on small ``(n, k)`` / ``(k, m)``
arrays; it runs in numpy (with sklearn's randomized SVD) and feeds the device loop.
"""

from __future__ import annotations

import numpy as np
from sklearn.utils import check_random_state
from sklearn.utils.extmath import randomized_svd

from ..utils import normalize

__all__ = ["plsa_init", "nndsvd_init"]


def nndsvd_init(X, k, rng):
    """Nonnegative double-SVD initialization, vectorized over components.

    The canonical NNDSVD scheme (Boutsidis & Gallopoulos 2008, as in sklearn
    NMF; reference behavior: plsa.py:458-493): take a rank-``k`` randomized
    SVD, keep ``sqrt(s0)`` times the absolute leading pair, and for every
    later component keep whichever sign half (positive or negative parts of
    the singular-vector pair) carries the larger norm product, rescaled to
    unit vectors times ``sqrt(s_j * mass)``.  The per-component loop is
    replaced by one masked selection over the trailing components.
    """
    U, S, Vt = randomized_svd(X, k, random_state=rng)
    doc_seed = np.empty_like(U)  # (n, k), becomes P(z|d)
    word_seed = np.empty_like(Vt)  # (k, m), becomes P(w|z)
    doc_seed[:, 0] = np.sqrt(S[0]) * np.abs(U[:, 0])
    word_seed[0, :] = np.sqrt(S[0]) * np.abs(Vt[0, :])

    # sign-split the trailing components all at once: columns of U, rows of Vt
    u_pos, u_neg = np.clip(U[:, 1:], 0, None), np.clip(-U[:, 1:], 0, None)
    v_pos, v_neg = np.clip(Vt[1:], 0, None), np.clip(-Vt[1:], 0, None)
    u_pos_n, u_neg_n = (np.linalg.norm(u_pos, axis=0),
                        np.linalg.norm(u_neg, axis=0))
    v_pos_n, v_neg_n = (np.linalg.norm(v_pos, axis=1),
                        np.linalg.norm(v_neg, axis=1))
    pos_mass, neg_mass = u_pos_n * v_pos_n, u_neg_n * v_neg_n
    keep_pos = pos_mass > neg_mass  # ties keep the negative half
    u_half = np.where(keep_pos[None, :], u_pos, u_neg)
    v_half = np.where(keep_pos[:, None], v_pos, v_neg)
    u_norm = np.where(keep_pos, u_pos_n, u_neg_n)
    v_norm = np.where(keep_pos, v_pos_n, v_neg_n)
    weight = np.sqrt(S[1:] * np.where(keep_pos, pos_mass, neg_mass))
    # normalize-then-scale (not a fused scale factor): keeps each element's
    # op sequence — and therefore the float64 result — exactly stable
    doc_seed[:, 1:] = weight * (u_half / np.maximum(u_norm, 1e-30))
    word_seed[1:, :] = weight[:, None] * (v_half / np.maximum(v_norm, 1e-30)[:, None])
    return doc_seed, word_seed


def plsa_init(X, k, init="random", rng=None):
    """Initialize ``(P(z|d), P(w|z))`` (reference plsa.py:412-513).

    Returns float32 arrays of shapes ``(n, k)`` and ``(k, m)``, l1-normalized
    along rows.
    """
    rng = check_random_state(rng)
    n, m = X.shape

    if init == "random":
        p_w_given_z = rng.rand(k, m)
        p_z_given_d = rng.rand(n, k)
    elif init == "nndsvd":
        p_z_given_d, p_w_given_z = nndsvd_init(X, k, rng)
    elif init == "nmf":
        from .nmf import nmf_frobenius_init

        p_z_given_d, p_w_given_z = nmf_frobenius_init(X, k, rng)
    elif isinstance(init, (tuple, list)):
        p_z_given_d, p_w_given_z = init
        p_z_given_d = np.array(p_z_given_d, dtype=np.float64, copy=True)
        p_w_given_z = np.array(p_w_given_z, dtype=np.float64, copy=True)
    else:
        raise ValueError("Unrecognized init {}".format(init))

    normalize(p_w_given_z, axis=1)
    normalize(p_z_given_d, axis=1)
    return (
        np.ascontiguousarray(p_z_given_d, dtype=np.float32),
        np.ascontiguousarray(p_w_given_z, dtype=np.float32),
    )
