"""Numeric primitives, input validation and sample-weight handling.

TPU-native rebuild of the reference L0 layer (see ``/root/reference/enstop/utils.py``):
the reference implements in-place l1 normalization as a numba-jitted scalar loop
(utils.py:8-41); here normalization is a vectorized numpy/jax expression that XLA fuses.
Topic-quality metrics (coherence / log-lift) live in :mod:`enstop_tpu.ops.metrics`.
"""

from __future__ import annotations

import numbers

import numpy as np
from scipy.sparse import issparse
from sklearn.preprocessing import normalize as sklearn_normalize
from sklearn.utils import check_array

__all__ = [
    "normalize",
    "normalized",
    "standardize_input",
    "_check_sample_weight",
    "arr_intersect",
]


def normalize(ndarray, axis=0):
    """l1-normalize a 2D array along ``axis`` **in place** (reference: utils.py:8-41).

    ``axis=0`` normalizes columns, ``axis=1`` normalizes rows.  Zero-sum slices are
    left untouched (the reference guards with ``marginal > 0``).
    """
    if axis not in (0, 1):
        raise ValueError("axis must be 0 or 1")
    marginal = ndarray.sum(axis=axis, keepdims=True)
    safe = np.where(marginal > 0.0, marginal, 1.0)
    ndarray /= safe
    return ndarray


def normalized(array, axis=1):
    """Pure (out-of-place) l1 row/column normalization; zero slices stay zero."""
    marginal = array.sum(axis=axis, keepdims=True)
    return array / np.where(marginal > 0.0, marginal, 1.0)


def standardize_input(input_matrix):
    """l1-row-normalize float-typed inputs; pass count data through unchanged
    (reference: utils.py:276-280)."""
    if input_matrix.dtype in (np.float32, np.float64):
        return sklearn_normalize(input_matrix, norm="l1")
    return input_matrix


def arr_intersect(ar1, ar2):
    """Intersection of two arrays (reference: utils.py:152-157)."""
    return np.intersect1d(ar1, ar2)


def _check_sample_weight(sample_weight, X, dtype=None):
    """Validate sample weights; ``None`` becomes an all-ones vector
    (behavioral parity with reference utils.py:285-335)."""
    n_samples = X.shape[0]

    if dtype is not None and dtype not in [np.float32, np.float64]:
        dtype = np.float64

    if sample_weight is None:
        sample_weight = np.ones(n_samples, dtype=dtype)
    elif isinstance(sample_weight, numbers.Number):
        sample_weight = np.full(n_samples, sample_weight, dtype=dtype)
    else:
        if dtype is None:
            dtype = [np.float64, np.float32]
        sample_weight = check_array(
            sample_weight,
            accept_sparse=False,
            ensure_2d=False,
            dtype=dtype,
            order="C",
        )
        if sample_weight.ndim != 1:
            raise ValueError("Sample weights must be 1D array or scalar")
        if sample_weight.shape != (n_samples,):
            raise ValueError(
                "sample_weight.shape == {}, expected {}!".format(
                    sample_weight.shape, (n_samples,)
                )
            )
    return sample_weight


def as_scipy_csr(X, dtype=np.float32):
    """Coerce dense / sparse input to CSR with the requested dtype."""
    from scipy.sparse import csr_matrix

    if issparse(X):
        return X.tocsr().astype(dtype)
    return csr_matrix(np.asarray(X, dtype=dtype))


def __getattr__(name):
    # the reference hosts the topic-quality metrics in enstop.utils
    # (utils.py:44-273); here they live in ops/metrics — re-export lazily so
    # `from enstop_tpu.utils import coherence` keeps working without a cycle
    if name in ("coherence", "mean_coherence", "log_lift", "mean_log_lift"):
        from .ops import metrics as _metrics

        return getattr(_metrics, name)
    raise AttributeError(name)
