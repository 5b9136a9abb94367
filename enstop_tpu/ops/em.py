"""Core pLSA EM math in matmul form — the TPU-native reformulation.

The reference (``/root/reference/enstop/plsa.py``) runs EM over the COO nonzeros of the
doc-term matrix with an explicit ``(nnz, k)`` responsibilities array:

* E-step (plsa.py:25-107):  ``P(z|w,d) = P(w|z) P(z|d) / sum_z P(w|z) P(z|d)``
* M-step (plsa.py:110-204): scatter-add ``x * P(z|w,d)`` into both factors, then
  l1-normalize ``P(w|z)`` rows (over words) and ``P(z|d)`` rows (over topics).
* log-likelihood (plsa.py:313-386): ``sum_nnz x * log(sum_z P(w|z) P(z|d)) * weight``.

Substituting the E-step into the M-step collapses both into matmul-shaped
multiplicative updates (no responsibilities array at all):

    S   = P(z|d) @ P(w|z)                        # predicted P(w|d), only needed at nnz
    R   = X / S  (where X > 0, else 0)
    A   = (w ⊙ P(z|d))^T @ R                     # (k, m) — sample-weighted, plsa.py:292-300
    B   = R @ P(w|z)^T                           # (n, k) — never weighted (the reference's
                                                 #   asymmetry: weights touch P(w|z) only)
    P(w|z) ← rownorm(P(w|z) ⊙ A)
    P(z|d) ← rownorm(P(z|d) ⊙ B)
    LL(inputs) = sum(w ⊙ X ⊙ log S)

This is exactly NMF-with-KL-loss multiplicative updates, which means every hot op is a
dense matmul on the MXU.  This module is the pure-XLA implementation (works on CPU and
TPU, used as the portable fallback and the numerical reference for the fused Pallas
kernel in :mod:`enstop_tpu.ops.pallas_em`).

Padding convention: callers may zero-pad ``X`` (rows/cols), ``p_z_given_d`` (rows and
topic columns) and ``p_w_given_z`` (topic rows and word columns).  Zero padding is
absorbing: padded entries contribute nothing and remain exactly zero through updates.

Note on ``e_step_thresh`` (plsa.py:98-102): the reference zeroes responsibilities whose
*unnormalized* value falls below a threshold (default 1e-32).  That per-(d,w,z) cutoff
has no rank-k matmul form; the default threshold is below the f32 normal range for
probability products and is a numerical no-op.  The exact thresholded semantics are
available in :mod:`enstop_tpu.ops.coo` (used by the parity test oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TINY = 1e-30  # guard for S -> 0; must stay in the f32 normal range (FTZ flushes denormals)


def _rownorm(a):
    """l1-normalize rows; all-zero rows stay zero (reference utils.py:35-41 guard)."""
    s = a.sum(axis=-1, keepdims=True)
    return a / jnp.maximum(s, _TINY)


def em_accumulators_dense(X, p_z_given_d, p_w_given_z, sample_weight=None):
    """The raw per-pass quantities: ``(A, B, ll)``.

    ``A = (w ⊙ P(z|d))^T @ R`` (k, m), ``B = R @ P(w|z)^T`` (n, k), and the
    log-likelihood of the input factors.  Exposed separately so the mesh-sharded
    backend can ``psum`` partial accumulators across devices before normalizing
    (the TPU-native analog of the reference's cross-block shard reduction,
    block_parallel_plsa.py:182-185).
    """
    Xf = X.astype(jnp.float32)
    S = jnp.dot(p_z_given_d, p_w_given_z, preferred_element_type=jnp.float32)
    nz = Xf > 0
    Ssafe = jnp.maximum(S, _TINY)
    R = jnp.where(nz, Xf / Ssafe, 0.0)

    if sample_weight is None:
        ll = jnp.sum(jnp.where(nz, Xf * jnp.log(Ssafe), 0.0))
        zd_w = p_z_given_d
    else:
        w = sample_weight.astype(jnp.float32)[:, None]
        ll = jnp.sum(jnp.where(nz, Xf * jnp.log(Ssafe), 0.0) * w)
        zd_w = p_z_given_d * w

    A = jax.lax.dot_general(
        zd_w, R, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (k, m)
    B = jax.lax.dot_general(
        R, p_w_given_z, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (n, k)
    return A, B, ll


def em_step_dense(X, p_z_given_d, p_w_given_z, sample_weight=None):
    """One full EM step in matmul form on a dense (zero-padded) count matrix.

    Parameters
    ----------
    X : (n, m) array — nonzeros are the sparse entries, zeros elsewhere.
    p_z_given_d : (n, k) array
    p_w_given_z : (k, m) array
    sample_weight : optional (n,) array of per-document weights.

    Returns
    -------
    (next_p_z_given_d, next_p_w_given_z, log_likelihood_of_inputs)

    The returned log-likelihood is that of the *input* factors (it reuses S, free);
    it equals the reference's ``log_likelihood`` before this step's M-update.
    """
    A, B, ll = em_accumulators_dense(X, p_z_given_d, p_w_given_z, sample_weight)
    next_wz = _rownorm(p_w_given_z * A)
    next_zd = _rownorm(p_z_given_d * B)
    return next_zd, next_wz, ll


def refit_step_dense(X, p_z_given_d, p_w_given_z, sample_weight=None):
    """One EM step with frozen topics: only ``P(z|d)`` updates.

    Mirrors the reference refit M-step (plsa.py:733-816), which ignores
    ``sample_weight`` in the accumulation; weights only enter the log-likelihood.
    """
    Xf = X.astype(jnp.float32)
    S = jnp.dot(p_z_given_d, p_w_given_z, preferred_element_type=jnp.float32)
    nz = Xf > 0
    Ssafe = jnp.maximum(S, _TINY)
    R = jnp.where(nz, Xf / Ssafe, 0.0)

    llmat = jnp.where(nz, Xf * jnp.log(Ssafe), 0.0)
    if sample_weight is None:
        ll = jnp.sum(llmat)
    else:
        ll = jnp.sum(llmat * sample_weight.astype(jnp.float32)[:, None])

    B = jax.lax.dot_general(
        R, p_w_given_z, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    next_zd = _rownorm(p_z_given_d * B)
    return next_zd, ll


def log_likelihood_dense(X, p_z_given_d, p_w_given_z, sample_weight=None):
    """``sum_nnz w_d * x * log(sum_z P(w|z) P(z|d))`` (reference plsa.py:313-386)."""
    Xf = X.astype(jnp.float32)
    S = jnp.dot(p_z_given_d, p_w_given_z, preferred_element_type=jnp.float32)
    nz = Xf > 0
    llmat = jnp.where(nz, Xf * jnp.log(jnp.maximum(S, _TINY)), 0.0)
    if sample_weight is None:
        return jnp.sum(llmat)
    return jnp.sum(llmat * sample_weight.astype(jnp.float32)[:, None])
