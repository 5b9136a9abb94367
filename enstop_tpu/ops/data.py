"""Data layout for the TPU EM kernels: padded dense blocks.

The TPU-native representation of the sparse doc-term matrix is a zero-padded dense
array whose dimensions are rounded up to hardware-friendly multiples (lane dim 128,
sublane dim 8 for f32).  The matmul-form EM (see :mod:`enstop_tpu.ops.em`) makes the
data matrix a pure MXU operand, so "sparse" handling reduces to: zeros contribute
nothing.  Zero padding is absorbing through every update (see ops/em.py docstring).

The reference instead pads COO tiles to a uniform max-nnz with -1 row sentinels
(block_parallel_plsa.py:48-49, 386-397); the dense-block layout replaces the sentinel
machinery with plain zeros.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import issparse

__all__ = [
    "round_up",
    "pad_dense_counts",
    "pad_factors",
    "unpad_factors",
]


def round_up(x: int, multiple: int) -> int:
    return -(-int(x) // int(multiple)) * int(multiple)


def pad_dense_counts(X, row_multiple=8, col_multiple=128, dtype=np.float32,
                     min_rows=1):
    """Densify a (sparse or dense) count matrix into a zero-padded numpy array.

    Returns ``(dense, n, m)`` with ``dense.shape = (round_up(n), round_up(m))``.
    ``min_rows`` lets callers pad to a coarser row target (shape bucketing for
    compiled-program reuse); the extra rows are absorbing zeros.
    """
    n, m = X.shape
    np_ = round_up(max(n, 1, int(min_rows)), row_multiple)
    mp_ = round_up(max(m, 1), col_multiple)
    out = np.zeros((np_, mp_), dtype=dtype)
    if issparse(X):
        if dtype == np.float32:
            # native OpenMP row scatter (enstop_tpu/native/packer.c); ~5x
            # np.add.at on warm pages, numpy fallback inside when no toolchain
            from ..native import densify_csr_rows

            densify_csr_rows(X.tocsr(), 0, n, out)
        else:
            coo = X.tocoo()
            np.add.at(out, (coo.row, coo.col), coo.data.astype(dtype))
    else:
        out[:n, :m] = np.asarray(X, dtype=dtype)
    return out, n, m


def pad_factors(p_z_given_d, p_w_given_z, n_pad, m_pad, k_multiple=8):
    """Zero-pad factors to padded dims; padded topics/docs/words stay exactly zero."""
    n, k = p_z_given_d.shape
    k2, m = p_w_given_z.shape
    assert k == k2
    kp = round_up(k, k_multiple)
    zd = np.zeros((n_pad, kp), dtype=np.float32)
    zd[:n, :k] = p_z_given_d
    wz = np.zeros((kp, m_pad), dtype=np.float32)
    wz[:k, :m] = p_w_given_z
    return zd, wz


def unpad_factors(p_z_given_d, p_w_given_z, n, m, k):
    return np.asarray(p_z_given_d)[:n, :k], np.asarray(p_w_given_z)[:k, :m]


def pad_vector(v, n_pad, fill=0.0):
    out = np.full((n_pad,), fill, dtype=np.float32)
    out[: v.shape[0]] = v
    return out
