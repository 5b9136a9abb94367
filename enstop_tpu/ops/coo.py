"""Exact reference-semantics EM on COO nonzeros (segment-sum formulation).

This path materializes the ``(nnz, k)`` responsibilities like the reference
(``/root/reference/enstop/plsa.py:25-310``) and applies the ``e_step_thresh``
sparsification cutoff exactly (plsa.py:98-102: an *unnormalized* product
``P(w|z)P(z|d)`` at or below the threshold is dropped from both the numerator and the
normalizer).  Scatter-adds become ``jax.ops.segment_sum`` over doc/word ids.

Use cases: the numerical oracle for the fast matmul/Pallas paths, and an exact path for
callers who rely on a non-default ``e_step_thresh``.  For speed on TPU prefer
:mod:`enstop_tpu.ops.em` / :mod:`enstop_tpu.ops.pallas_em`.

COO arrays may be zero-padded: padding entries must carry ``vals == 0`` (and any valid
row/col id); zero values contribute nothing to either factor or the log-likelihood.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TINY = 1e-30  # guard for S -> 0; must stay in the f32 normal range (FTZ flushes denormals)


def e_step_coo(rows, cols, vals, p_z_given_d, p_w_given_z, probability_threshold=1e-32):
    """Responsibilities ``P(z|w,d)`` for each nonzero (reference plsa.py:25-107).

    Returns an ``(nnz, k)`` array. Products strictly greater than
    ``probability_threshold`` survive (plsa.py:97 uses ``>``); rows whose surviving
    mass is zero stay all-zero.
    """
    v = p_z_given_d[rows, :] * p_w_given_z[:, cols].T  # (nnz, k)
    v = jnp.where(v > probability_threshold, v, 0.0)
    norm = v.sum(axis=1, keepdims=True)
    return v / jnp.maximum(norm, _TINY)


def m_step_coo(rows, cols, vals, resp, n, m, sample_weight=None):
    """M-step via segment sums (reference plsa.py:110-310).

    ``sample_weight`` multiplies only the ``P(w|z)`` accumulation and its normalizer
    (the reference's asymmetry, plsa.py:292-300); ``P(z|d)`` is never weighted.
    """
    xw = (vals[:, None] * resp).astype(jnp.float32)  # (nnz, k)
    if sample_weight is None:
        xw_for_words = xw
    else:
        xw_for_words = xw * sample_weight[rows][:, None]

    # P(w|z): (k, m) — scatter over word id, then l1-normalize rows over words.
    pwz = jax.ops.segment_sum(xw_for_words, cols, num_segments=m).T
    pwz = pwz / jnp.maximum(pwz.sum(axis=1, keepdims=True), _TINY)

    # P(z|d): (n, k) — scatter over doc id, then l1-normalize rows over topics.
    pzd = jax.ops.segment_sum(xw, rows, num_segments=n)
    pzd = pzd / jnp.maximum(pzd.sum(axis=1, keepdims=True), _TINY)
    return pzd, pwz


@partial(jax.jit, static_argnames=("n", "m"))
def em_step_coo(
    rows,
    cols,
    vals,
    p_z_given_d,
    p_w_given_z,
    n,
    m,
    sample_weight=None,
    probability_threshold=1e-32,
):
    """One exact EM step; also returns the log-likelihood of the *input* factors."""
    resp = e_step_coo(rows, cols, vals, p_z_given_d, p_w_given_z, probability_threshold)
    ll = log_likelihood_coo(rows, cols, vals, p_z_given_d, p_w_given_z, sample_weight)
    pzd, pwz = m_step_coo(rows, cols, vals, resp, n, m, sample_weight)
    return pzd, pwz, ll


def log_likelihood_coo(rows, cols, vals, p_z_given_d, p_w_given_z, sample_weight=None):
    """Log-likelihood over nonzeros (reference plsa.py:313-386)."""
    s = jnp.sum(p_z_given_d[rows, :] * p_w_given_z[:, cols].T, axis=1)
    term = vals * jnp.log(jnp.maximum(s, _TINY))
    term = jnp.where(vals > 0, term, 0.0)
    if sample_weight is not None:
        term = term * sample_weight[rows]
    return jnp.sum(term)
