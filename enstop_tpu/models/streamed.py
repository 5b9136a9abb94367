"""Streamed / out-of-core pLSA estimator (reference streamed_plsa.py:1042-1337).

The heavy lifting lives in :mod:`enstop_tpu.models.streamed_core`: host memory
is O(nnz) (per-block sparse chunk arrays, packed once), device memory is
O(block), and each EM iteration streams every block host→HBM exactly once —
the log-likelihood convergence values come free from the same pass.

``block_size`` is the number of *documents* per streamed block (the reference
streams windows of 65536 *nonzeros*, streamed_plsa.py:1128; document blocks
are the natural unit for the fused chunk kernels).
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import coo_matrix, issparse
from sklearn.utils import check_array, check_random_state

from ..utils import _check_sample_weight
from .base import TopicModelBase, reinsert_zero_rows, split_zero_rows, validate_corpus
from .streamed_core import streamed_fit_core, streamed_refit_core


class StreamedPLSA(TopicModelBase):
    """Out-of-core pLSA for corpora larger than device (or host dense) memory.

    For corpora whose *nonzeros* fit in HBM, prefer ``PLSA(backend="sparse")``
    (device-resident, no per-iteration streaming); this class exists for data
    beyond that (reference streamed_plsa.py:1056-1058: "very large training
    data").
    """

    def __init__(
        self,
        n_components=10,
        init="random",
        block_size=65536,
        n_iter=100,
        n_iter_per_test=10,
        tolerance=0.001,
        e_step_thresh=1e-32,
        transform_random_seed=42,
        random_state=None,
        backend="auto",
    ):
        self.n_components = n_components
        self.init = init
        self.block_size = block_size
        self.n_iter = n_iter
        self.n_iter_per_test = n_iter_per_test
        self.tolerance = tolerance
        self.e_step_thresh = e_step_thresh
        self.transform_random_seed = transform_random_seed
        self.random_state = random_state
        self.backend = backend

    def fit_transform(self, X, y=None, sample_weight=None):
        X, sample_weight = validate_corpus(X, sample_weight)
        data, good_rows, zero_rows_found = split_zero_rows(X)

        U, V, n_steps, ll_trace = streamed_fit_core(
            data,
            self.n_components,
            sample_weight=sample_weight[good_rows] if zero_rows_found else sample_weight,
            init=self.init,
            block_docs=self.block_size,
            n_iter=self.n_iter,
            n_iter_per_test=self.n_iter_per_test,
            tolerance=self.tolerance,
            e_step_thresh=self.e_step_thresh,
            random_state=self.random_state,
        )
        if zero_rows_found:
            self.embedding_ = reinsert_zero_rows(U, good_rows, X.shape[0], self.n_components)
        else:
            self.embedding_ = U
        self.components_ = V
        self.training_data_ = X
        self.n_iter_ = n_steps
        self.history_ = np.asarray(ll_trace, dtype=np.float64)
        return self.embedding_

    def transform(self, X, y=None, sample_weight=None):
        X = check_array(X, accept_sparse="csr")
        self._validate_transform_input(X)
        if not issparse(X):
            X = coo_matrix(X).tocsr()
        if sample_weight is not None:
            sample_weight = _check_sample_weight(sample_weight, X)
        return streamed_refit_core(
            X,
            self.components_,
            sample_weight=sample_weight,
            block_docs=self.block_size,
            n_iter=50,
            n_iter_per_test=5,
            tolerance=0.001,
            e_step_thresh=self.e_step_thresh,
            random_state=check_random_state(self.transform_random_seed),
        )
