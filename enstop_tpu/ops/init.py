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
    """Non-negative double SVD init (reference plsa.py:458-493, after sklearn NMF)."""
    U, S, V = randomized_svd(X, k, random_state=rng)
    p_z_given_d = np.zeros(U.shape)
    p_w_given_z = np.zeros(V.shape)

    p_z_given_d[:, 0] = np.sqrt(S[0]) * np.abs(U[:, 0])
    p_w_given_z[0, :] = np.sqrt(S[0]) * np.abs(V[0, :])

    for j in range(1, k):
        x, y = U[:, j], V[j, :]
        x_p, y_p = np.maximum(x, 0), np.maximum(y, 0)
        x_n, y_n = np.abs(np.minimum(x, 0)), np.abs(np.minimum(y, 0))
        x_p_nrm, y_p_nrm = np.linalg.norm(x_p), np.linalg.norm(y_p)
        x_n_nrm, y_n_nrm = np.linalg.norm(x_n), np.linalg.norm(y_n)
        m_p, m_n = x_p_nrm * y_p_nrm, x_n_nrm * y_n_nrm
        if m_p > m_n:
            u = x_p / max(x_p_nrm, 1e-30)
            v = y_p / max(y_p_nrm, 1e-30)
            sigma = m_p
        else:
            u = x_n / max(x_n_nrm, 1e-30)
            v = y_n / max(y_n_nrm, 1e-30)
            sigma = m_n
        lbd = np.sqrt(S[j] * sigma)
        p_z_given_d[:, j] = lbd * u
        p_w_given_z[j, :] = lbd * v

    return p_z_given_d, p_w_given_z


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
