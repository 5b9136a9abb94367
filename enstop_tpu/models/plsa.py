"""PLSA estimator — the canonical single-model API (reference plsa.py:1000-1285).

sklearn-compatible: ``fit`` / ``fit_transform`` / ``transform``; fitted attributes
``components_``, ``embedding_``, ``training_data_``.  The EM itself runs as one
compiled on-device program (fused Pallas on TPU, XLA matmuls elsewhere).
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import coo_matrix, issparse
from sklearn.utils import check_array, check_random_state

from ..ops.driver import plsa_fit, plsa_refit
from ..utils import _check_sample_weight
from .base import TopicModelBase, reinsert_zero_rows, split_zero_rows, validate_corpus


class PLSA(TopicModelBase):
    """Probabilistic Latent Semantic Analysis, TPU-native.

    Parameters mirror the reference estimator (plsa.py:1076-1096); ``backend``
    selects the execution path (``"auto"`` = fused Pallas kernel on TPU, XLA
    matmuls otherwise).

    ``e_step_thresh``: the default (1e-32) is a numerical no-op in f32 and the
    fast dense paths skip the cutoff; a materially-firing threshold (> 1e-30)
    auto-routes the fit to the sparse backend, which applies the reference's
    exact pre-normalization cutoff (plsa.py:97-102).  Measured at 20NG scale
    the ensemble's 1e-16 changes the final log-likelihood by 3e-6 relative
    (docs/PERFORMANCE.md).

    ``precision``: ``"default"`` (bf16 MXU multiplies, f32 everything else),
    ``"highest"`` (true f32 matmuls, ~2x slower steps), or ``"fast"`` (also
    computes the E-step responsibilities in bf16 — measured ~20% faster
    iterations on TPU at k<=100; the reached optimum is statistically
    equivalent but no longer bit-comparable; see ops/driver.py:plsa_fit).
    """

    def __init__(
        self,
        n_components=10,
        init="random",
        n_iter=100,
        n_iter_per_test=10,
        tolerance=0.001,
        e_step_thresh=1e-32,
        transform_random_seed=42,
        random_state=None,
        backend="auto",
        precision="default",
    ):
        self.n_components = n_components
        self.init = init
        self.n_iter = n_iter
        self.n_iter_per_test = n_iter_per_test
        self.tolerance = tolerance
        self.e_step_thresh = e_step_thresh
        self.transform_random_seed = transform_random_seed
        self.random_state = random_state
        self.backend = backend
        self.precision = precision

    def fit_transform(self, X, y=None, sample_weight=None):
        """Fit and return the document embedding ``P(z|d)``.

        ``X`` may be a scipy sparse / dense matrix, or a
        :class:`~enstop_tpu.ops.driver.PreparedCounts` (device-resident, padded;
        see ``prepare_counts``) to skip densify + transfer on repeated fits —
        in that case validation/zero-row handling are skipped (zero rows come
        back as zero embeddings natively) and ``training_data_`` is not set.
        """
        from ..ops.driver import PreparedCounts
        from ..ops.sell import PreparedSell

        if isinstance(X, (PreparedCounts, PreparedSell)):
            from ..utils import _check_sample_weight

            sample_weight = _check_sample_weight(sample_weight, X, dtype=np.float32)
            U, V, info = plsa_fit(
                X,
                self.n_components,
                sample_weight=sample_weight,
                init=self.init,
                n_iter=self.n_iter,
                n_iter_per_test=self.n_iter_per_test,
                tolerance=self.tolerance,
                e_step_thresh=self.e_step_thresh,
                random_state=self.random_state,
                precision=self.precision,
                return_info=True,
            )
            self.embedding_, self.components_ = U, V
            self.training_data_ = None
            self.history_ = info["ll_trace"]
            self.n_iter_ = info["n_steps"]
            self.fit_info_ = info
            return self.embedding_

        X, sample_weight = validate_corpus(X, sample_weight)
        data_for_fitting, good_rows, zero_rows_found = split_zero_rows(X)

        U, V, info = plsa_fit(
            data_for_fitting,
            self.n_components,
            sample_weight=sample_weight[good_rows] if zero_rows_found else sample_weight,
            init=self.init,
            n_iter=self.n_iter,
            n_iter_per_test=self.n_iter_per_test,
            tolerance=self.tolerance,
            e_step_thresh=self.e_step_thresh,
            random_state=self.random_state,
            backend=self.backend,
            precision=self.precision,
            return_info=True,
        )
        # Observability the reference computes but discards (plsa.py:630-638):
        # the log-likelihood trajectory at each convergence test, the iteration
        # count actually run, and device-side fit throughput.
        self.history_ = info["ll_trace"]
        self.n_iter_ = info["n_steps"]
        self.fit_info_ = info

        if zero_rows_found:
            self.embedding_ = reinsert_zero_rows(U, good_rows, X.shape[0], self.n_components)
        else:
            self.embedding_ = U
        self.components_ = V
        self.training_data_ = X
        return self.embedding_

    def transform(self, X, y=None):
        """Embed new documents against the fitted topics (refit of P(z|d) only,
        reference plsa.py:1184-1221)."""
        X = check_array(X, accept_sparse="csr")
        self._validate_transform_input(X)
        random_state = check_random_state(self.transform_random_seed)
        if not issparse(X):
            X = coo_matrix(X)
        sample_weight = _check_sample_weight(None, X, dtype=np.float32)

        return plsa_refit(
            X,
            self.components_,
            sample_weight=sample_weight,
            n_iter=50,
            n_iter_per_test=5,
            tolerance=0.001,
            random_state=random_state,
            backend=self.backend,
            precision=self.precision,
        )
