"""Drop-in import path for reference users: ``from enstop.plsa import ...`` maps
to ``from enstop_tpu.plsa import ...`` (reference module: enstop/plsa.py).

Besides the estimator/driver surface, this module exports the reference's
module-public kernel symbols (``plsa_e_step``, ``plsa_m_step``,
``plsa_m_step_w_sample_weight``, ``log_likelihood``, ``plsa_refit_m_step`` —
reference plsa.py:25-386, 733-816) as thin wrappers over the exact COO
semantics in :mod:`enstop_tpu.ops.coo`.  They keep the reference's numba
calling convention — COO arrays passed separately, output arrays mutated in
place AND returned, norm scratch arrays filled — so code written against the
reference's kernel API runs unchanged.  They are compatibility shims, not the
production path: fits go through ``ops/fit.py``'s compiled while-loop programs.
"""

import numpy as np

from .models.plsa import PLSA
from .ops import coo as _coo
from .ops.driver import plsa_fit, plsa_refit
from .ops.init import plsa_init

__all__ = [
    "PLSA",
    "plsa_fit",
    "plsa_refit",
    "plsa_init",
    "norm",
    "plsa_e_step",
    "plsa_m_step",
    "plsa_m_step_w_sample_weight",
    "log_likelihood",
    "plsa_refit_m_step",
    "plsa_fit_inner",
    "plsa_refit_inner",
]


def norm(x):
    """l2-norm of a vector (reference plsa.py:390-412)."""
    return float(np.linalg.norm(x))


def plsa_e_step(
    X_rows,
    X_cols,
    X_vals,
    p_w_given_z,
    p_z_given_d,
    p_z_given_wd,
    probability_threshold=1e-32,
):
    """E-step: responsibilities ``P(z|w,d)`` per nonzero, written into
    ``p_z_given_wd`` (reference plsa.py:25-107)."""
    resp = np.asarray(
        _coo.e_step_coo(
            np.asarray(X_rows), np.asarray(X_cols), np.asarray(X_vals),
            np.asarray(p_z_given_d), np.asarray(p_w_given_z),
            probability_threshold=probability_threshold,
        )
    )
    p_z_given_wd[:] = resp.astype(p_z_given_wd.dtype, copy=False)
    return p_z_given_wd


def _fill_norms(X_rows, X_vals, resp, sample_weight, norm_pwz, norm_pdz):
    """The reference's norm scratch arrays hold the un-normalized factor row
    sums on return; fill them the same way (weight on norm_pwz only)."""
    xw = np.asarray(X_vals, np.float64)[:, None] * np.asarray(resp, np.float64)
    if norm_pwz is not None:
        xw_w = xw if sample_weight is None else (
            xw * np.asarray(sample_weight, np.float64)[np.asarray(X_rows)][:, None]
        )
        norm_pwz[:] = xw_w.sum(axis=0).astype(norm_pwz.dtype)
    if norm_pdz is not None:
        norm_pdz[:] = np.bincount(
            np.asarray(X_rows), weights=xw.sum(axis=1), minlength=norm_pdz.shape[0]
        ).astype(norm_pdz.dtype)


def plsa_m_step(
    X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, p_z_given_wd, norm_pwz, norm_pdz
):
    """M-step: re-estimate ``P(w|z)``/``P(z|d)`` from the responsibilities,
    in place (reference plsa.py:110-204)."""
    pzd, pwz = _coo.m_step_coo(
        np.asarray(X_rows), np.asarray(X_cols), np.asarray(X_vals),
        np.asarray(p_z_given_wd),
        p_z_given_d.shape[0], p_w_given_z.shape[1],
    )
    p_w_given_z[:] = np.asarray(pwz).astype(p_w_given_z.dtype, copy=False)
    p_z_given_d[:] = np.asarray(pzd).astype(p_z_given_d.dtype, copy=False)
    _fill_norms(X_rows, X_vals, p_z_given_wd, None, norm_pwz, norm_pdz)
    return p_w_given_z, p_z_given_d


def plsa_m_step_w_sample_weight(
    X_rows,
    X_cols,
    X_vals,
    p_w_given_z,
    p_z_given_d,
    p_z_given_wd,
    sample_weight,
    norm_pwz,
    norm_pdz,
):
    """Weighted M-step: the weight applies to the ``P(w|z)`` accumulation and
    its normalizer only, never ``P(z|d)`` (reference plsa.py:207-310)."""
    pzd, pwz = _coo.m_step_coo(
        np.asarray(X_rows), np.asarray(X_cols), np.asarray(X_vals),
        np.asarray(p_z_given_wd),
        p_z_given_d.shape[0], p_w_given_z.shape[1],
        sample_weight=np.asarray(sample_weight, np.float32),
    )
    p_w_given_z[:] = np.asarray(pwz).astype(p_w_given_z.dtype, copy=False)
    p_z_given_d[:] = np.asarray(pzd).astype(p_z_given_d.dtype, copy=False)
    _fill_norms(X_rows, X_vals, p_z_given_wd, sample_weight, norm_pwz, norm_pdz)
    return p_w_given_z, p_z_given_d


def log_likelihood(X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, sample_weight):
    """Weighted data log-likelihood over nonzeros (reference plsa.py:313-386)."""
    return float(
        _coo.log_likelihood_coo(
            np.asarray(X_rows), np.asarray(X_cols), np.asarray(X_vals),
            np.asarray(p_z_given_d), np.asarray(p_w_given_z),
            sample_weight=np.asarray(sample_weight, np.float32),
        )
    )


def plsa_refit_m_step(
    X_rows,
    X_cols,
    X_vals,
    p_w_given_z,
    p_z_given_d,
    p_z_given_wd,
    sample_weight,
    norm_pdz,
):
    """Refit M-step: topics frozen, only ``P(z|d)`` re-estimated (reference
    plsa.py:733-816; like the reference, ``sample_weight`` does not enter the
    ``P(z|d)`` accumulation)."""
    pzd, _ = _coo.m_step_coo(
        np.asarray(X_rows), np.asarray(X_cols), np.asarray(X_vals),
        np.asarray(p_z_given_wd),
        p_z_given_d.shape[0], p_w_given_z.shape[1],
    )
    p_z_given_d[:] = np.asarray(pzd).astype(p_z_given_d.dtype, copy=False)
    _fill_norms(X_rows, X_vals, p_z_given_wd, None, None, norm_pdz)
    return p_w_given_z, p_z_given_d


def plsa_fit_inner(
    X_rows,
    X_cols,
    X_vals,
    p_w_given_z,
    p_z_given_d,
    sample_weight,
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=1e-32,
    use_sample_weights=False,
):
    """EM loop from caller-supplied factors, reference schedule exactly
    (plsa.py:517-640): test at ``i % n_iter_per_test == 0`` against the
    pre-loop log-likelihood; returns ``(p_z_given_d, p_w_given_z)``.

    Compatibility shim over the COO kernels above — useful for warm starts
    against the reference's functional API; production fits go through the
    compiled while-loop programs in ``ops/fit.py``.
    """
    k = p_z_given_d.shape[1]
    n = p_z_given_d.shape[0]
    p_z_given_wd = np.zeros((np.asarray(X_vals).shape[0], k), dtype=np.float32)
    norm_pwz = np.zeros(k, dtype=np.float32)
    norm_pdz = np.zeros(n, dtype=np.float32)

    previous_log_likelihood = log_likelihood(
        X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, sample_weight
    )

    for i in range(n_iter):
        plsa_e_step(
            X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, p_z_given_wd,
            e_step_thresh,
        )
        if use_sample_weights:
            plsa_m_step_w_sample_weight(
                X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, p_z_given_wd,
                sample_weight, norm_pwz, norm_pdz,
            )
        else:
            plsa_m_step(
                X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, p_z_given_wd,
                norm_pwz, norm_pdz,
            )
        if i % n_iter_per_test == 0:
            current_log_likelihood = log_likelihood(
                X_rows, X_cols, X_vals, p_w_given_z, p_z_given_d, sample_weight
            )
            change = np.abs(current_log_likelihood - previous_log_likelihood)
            if change == 0 or change / np.abs(current_log_likelihood) < tolerance:
                break
            previous_log_likelihood = current_log_likelihood

    return p_z_given_d, p_w_given_z


def plsa_refit_inner(
    X_rows,
    X_cols,
    X_vals,
    topics,
    p_z_given_d,
    sample_weight,
    n_iter=50,
    n_iter_per_test=10,
    tolerance=0.005,
    e_step_thresh=1e-32,
):
    """Frozen-topic EM loop from caller-supplied ``p_z_given_d``, reference
    schedule exactly (plsa.py:820-921) INCLUDING the reference's dead
    convergence gate (``current_log_likelihood > 0`` never holds, plsa.py:913,
    so all ``n_iter`` iterations always run — preserved verbatim because this
    is the compatibility surface; the production refit in ``ops/driver.py``
    fixes the gate).  Returns ``p_z_given_d``.
    """
    k = topics.shape[0]
    p_z_given_wd = np.zeros((np.asarray(X_rows).shape[0], k), dtype=np.float32)
    norm_pdz = np.zeros(p_z_given_d.shape[0], dtype=np.float32)

    previous_log_likelihood = log_likelihood(
        X_rows, X_cols, X_vals, topics, p_z_given_d, sample_weight
    )

    for i in range(n_iter):
        plsa_e_step(
            X_rows, X_cols, X_vals, topics, p_z_given_d, p_z_given_wd,
            e_step_thresh,
        )
        plsa_refit_m_step(
            X_rows, X_cols, X_vals, topics, p_z_given_d, p_z_given_wd,
            sample_weight, norm_pdz,
        )
        if i % n_iter_per_test == 0:
            current_log_likelihood = log_likelihood(
                X_rows, X_cols, X_vals, topics, p_z_given_d, sample_weight
            )
            if current_log_likelihood > 0:
                change = np.abs(current_log_likelihood - previous_log_likelihood)
                if change / np.abs(current_log_likelihood) < tolerance:
                    break
                previous_log_likelihood = current_log_likelihood

    return p_z_given_d
