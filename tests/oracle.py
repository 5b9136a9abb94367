"""NumPy oracle replicating the reference's EM math exactly.

A direct, unoptimized transcription of the reference semantics (cited per function)
used to verify the TPU-native kernels.  Deliberately scalar/numpy so its correctness
is obvious by inspection against /root/reference/enstop/plsa.py.
"""

import numpy as np


def e_step(rows, cols, vals, pwz, pzd, thresh=1e-32):
    """Reference plsa.py:25-107: normalized responsibilities with pre-normalization
    threshold on the unnormalized product (strict >)."""
    nnz = len(vals)
    k = pwz.shape[0]
    resp = np.zeros((nnz, k), dtype=np.float64)
    for idx in range(nnz):
        d, w = rows[idx], cols[idx]
        # threshold comparison in f32, like the reference's f4 kernels (plsa.py:26)
        v32 = pwz[:, w].astype(np.float32) * pzd[d, :].astype(np.float32)
        v = np.where(v32 > np.float32(thresh), v32.astype(np.float64), 0.0)
        norm = v.sum()
        resp[idx] = v / norm if norm > 0 else 0.0
    return resp


def m_step(rows, cols, vals, resp, n, m, sample_weight=None):
    """Reference plsa.py:110-310: scatter-add + l1 row normalization; sample weights
    multiply only the P(w|z) accumulation."""
    k = resp.shape[1]
    pwz = np.zeros((k, m), dtype=np.float64)
    pzd = np.zeros((n, k), dtype=np.float64)
    for idx in range(len(vals)):
        d, w = rows[idx], cols[idx]
        s = vals[idx] * resp[idx]
        if sample_weight is not None:
            pwz[:, w] += s * sample_weight[d]
        else:
            pwz[:, w] += s
        pzd[d, :] += s
    pwz_norm = pwz.sum(axis=1, keepdims=True)
    pzd_norm = pzd.sum(axis=1, keepdims=True)
    pwz = np.divide(pwz, pwz_norm, out=np.zeros_like(pwz), where=pwz_norm > 0)
    pzd = np.divide(pzd, pzd_norm, out=np.zeros_like(pzd), where=pzd_norm > 0)
    return pzd, pwz


def refit_m_step(rows, cols, vals, resp, n):
    """Reference plsa.py:733-816: only P(z|d) updates; sample_weight ignored."""
    k = resp.shape[1]
    pzd = np.zeros((n, k), dtype=np.float64)
    for idx in range(len(vals)):
        d = rows[idx]
        pzd[d, :] += vals[idx] * resp[idx]
    norm = pzd.sum(axis=1, keepdims=True)
    return np.divide(pzd, norm, out=np.zeros_like(pzd), where=norm > 0)


def log_likelihood(rows, cols, vals, pwz, pzd, sample_weight=None):
    """Reference plsa.py:313-386."""
    result = 0.0
    for idx in range(len(vals)):
        d, w = rows[idx], cols[idx]
        s = float(pwz[:, w] @ pzd[d, :])
        term = vals[idx] * np.log(s)
        if sample_weight is not None:
            term *= sample_weight[d]
        result += term
    return result


def fit(rows, cols, vals, pzd, pwz, n, m, n_iter=100, n_iter_per_test=10,
        tolerance=0.001, thresh=1e-32, sample_weight=None):
    """Reference plsa.py:516-640 loop with the exact test schedule."""
    pzd = pzd.astype(np.float64).copy()
    pwz = pwz.astype(np.float64).copy()
    prev_ll = log_likelihood(rows, cols, vals, pwz, pzd, sample_weight)
    lls = [prev_ll]
    steps = 0
    for i in range(n_iter):
        resp = e_step(rows, cols, vals, pwz, pzd, thresh)
        pzd, pwz = m_step(rows, cols, vals, resp, n, m, sample_weight)
        steps += 1
        if i % n_iter_per_test == 0:
            cur = log_likelihood(rows, cols, vals, pwz, pzd, sample_weight)
            lls.append(cur)
            change = abs(cur - prev_ll)
            if change == 0 or change / abs(cur) < tolerance:
                break
            prev_ll = cur
    return pzd, pwz, steps, lls


def to_coo(X):
    rows, cols = np.nonzero(X)
    vals = X[rows, cols].astype(np.float64)
    return rows.astype(np.int32), cols.astype(np.int32), vals
