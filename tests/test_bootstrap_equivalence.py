"""The ensemble's multinomial-weight bootstrap is exactly the reference's
row-resample (enstop_.py:87-88) when duplicated rows share their init.

For a resample with row multiset ``idx``: the resampled matrix's P(w|z)
accumulation equals the weighted accumulation with w[d] = multiplicity(d), and
each duplicate row's P(z|d) trajectory equals its unique row's (same data, same
init, row-local updates).  This test verifies trajectory identity through
several EM steps.
"""

import numpy as np
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu.ops import em as em_ops


def test_weighted_fit_equals_resampled_fit(rng):
    X = make_corpus(rng, n_docs=40, n_words=50, seed=8)
    idx = rng.randint(0, 40, size=40)
    counts = np.bincount(idx, minlength=40).astype(np.float32)

    B = X[idx]  # the reference's materialized bootstrap sample

    pzd0 = rng.rand(40, 5).astype(np.float32)
    pzd0 /= pzd0.sum(1, keepdims=True)
    pwz0 = rng.rand(5, 50).astype(np.float32)
    pwz0 /= pwz0.sum(1, keepdims=True)

    # weighted path: unique rows, multiplicity weights
    zd_w, wz_w = pzd0.copy(), pwz0.copy()
    # resample path: duplicated rows, duplicated init
    zd_r, wz_r = pzd0[idx].copy(), pwz0.copy()

    for _ in range(6):
        zd_w, wz_w, _ = em_ops.em_step_dense(X, zd_w, wz_w, sample_weight=counts)
        zd_r, wz_r, _ = em_ops.em_step_dense(B, zd_r, wz_r)

    np.testing.assert_allclose(np.asarray(wz_w), np.asarray(wz_r), rtol=1e-4, atol=1e-6)
    # duplicate rows' embeddings equal the corresponding unique-row embeddings
    np.testing.assert_allclose(
        np.asarray(zd_r), np.asarray(zd_w)[idx], rtol=1e-4, atol=1e-6
    )
