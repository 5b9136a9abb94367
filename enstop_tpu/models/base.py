"""Shared sklearn-estimator machinery for all topic models.

The reference repeats validation, zero-row handling and the ``coherence()`` /
``log_lift()`` methods on every estimator (plsa.py:1000-1285, streamed_plsa.py:1042-
1337, enstop_.py:587-927); here they live once on a mixin.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import csr_matrix, issparse
from sklearn.base import BaseEstimator, TransformerMixin
from sklearn.utils import check_array

from ..ops.metrics import coherence, log_lift, mean_coherence, mean_log_lift
from ..utils import _check_sample_weight, standardize_input


def validate_corpus(X, sample_weight=None):
    """check_array + standardize_input + non-negativity check + CSR coercion
    (reference plsa.py:1138-1149)."""
    X = check_array(X, accept_sparse="csr")
    X = standardize_input(X)
    if not issparse(X):
        X = csr_matrix(X)
    sample_weight = _check_sample_weight(sample_weight, X, dtype=np.float32)
    if sample_weight.size and not np.any(sample_weight > 0):
        # all-zero weights make the weighted P(w|z) M-step numerator
        # identically zero — the model is undefined.  The reference silently
        # produces NaNs here; raising is the sklearn-contract behavior.
        raise ValueError("All sample weights are zero: the weighted pLSA "
                         "M-step is undefined.")
    if np.any(X.data < 0):
        # the reference's message (plsa.py:1148) + sklearn's canonical
        # "Negative values in data" phrasing so generic tooling matches it
        raise ValueError(
            "PLSA is only valid for matrices with non-negative entries "
            "(Negative values in data passed to fit)"
        )
    return X, sample_weight


def split_zero_rows(X):
    """Remove all-zero document rows before fitting (reference plsa.py:1151-1159).

    Returns ``(X_nonzero, good_rows_mask, any_removed)``.
    """
    row_sums = np.asarray(X.sum(axis=1)).ravel()
    good_rows = row_sums != 0
    if not np.all(good_rows):
        return X[good_rows], good_rows, True
    return X, good_rows, False


def reinsert_zero_rows(embedding, good_rows, n_rows, k):
    """Re-insert zero embeddings for removed rows (reference plsa.py:1173-1177)."""
    out = np.zeros((n_rows, k), dtype=embedding.dtype)
    out[good_rows] = embedding
    return out


class TopicModelBase(TransformerMixin, BaseEstimator):
    """Base class: fit plumbing + topic-quality metrics + checkpointing.

    Fitted attributes (identical contract to the reference):
    ``components_`` (k, n_words), ``embedding_`` (n_docs, k), ``training_data_``.

    NB: the reference inherits ``(BaseEstimator, TransformerMixin)``
    (plsa.py:1000); modern sklearn requires the mixin first for its tag
    system — behavior is identical (``fit_transform`` is overridden)."""

    def fit(self, X, y=None, sample_weight=None, **fit_params):
        # explicit sample_weight so the reference's positional calling
        # convention works too (e.g. plsa.py:1141 `def fit(self, X, y=None,
        # sample_weight=None)`)
        self.fit_transform(X, sample_weight=sample_weight, **fit_params)
        return self

    def __sklearn_tags__(self):
        tags = super().__sklearn_tags__()
        # counts / term frequencies only, like sklearn's NMF
        tags.input_tags.positive_only = True
        tags.input_tags.sparse = True
        # transform is a fresh frozen-topic refit (reference plsa.py:1184-
        # 1220): a different EM path than fit's joint optimization, so
        # fit_transform and transform agree only approximately
        tags.non_deterministic = True
        # factors are float32 by design (reference uses f32 throughout)
        tags.transformer_tags.preserves_dtype = []
        return tags

    def _validate_transform_input(self, X):
        """Fitted-state + feature-count guard shared by every transform."""
        from sklearn.utils.validation import check_is_fitted

        check_is_fitted(self, "components_")
        if X.shape[1] != self.components_.shape[1]:
            # sklearn's canonical wording (validate_data's reset=False check)
            raise ValueError(
                f"X has {X.shape[1]} features, but {type(self).__name__} "
                f"is expecting {self.components_.shape[1]} features as input"
            )

    @property
    def n_features_in_(self):
        # sklearn contract: defined only after fit (hasattr-probed)
        if not hasattr(self, "components_"):
            raise AttributeError("n_features_in_ is only available after fit")
        return self.components_.shape[1]

    # -- checkpoint / resume ---------------------------------------------------
    # The reference has no persistence beyond pickling the estimator (SURVEY §5);
    # warm-starts exist only via init=(P(z|d), P(w|z)) tuples (plsa.py:505-506).
    # save()/load() persist the fitted factors + constructor params; the factor
    # tuple plugs straight back into `init=` to resume training.

    def save(self, path):
        """Persist fitted state to an ``.npz`` checkpoint."""
        payload = {
            "components_": self.components_,
            "embedding_": self.embedding_,
            "params_json": np.frombuffer(
                __import__("json").dumps(
                    {k: v for k, v in self.get_params().items()
                     if isinstance(v, (int, float, str, bool, type(None)))}
                ).encode(),
                dtype=np.uint8,
            ),
            "class_name": np.frombuffer(type(self).__name__.encode(), dtype=np.uint8),
        }
        if hasattr(self, "history_"):
            payload["history_"] = np.asarray(self.history_)
        np.savez_compressed(path, **payload)

    @classmethod
    def load(cls, path):
        """Restore an estimator from :meth:`save` output.  ``training_data_`` is
        not persisted; metrics needing it require a refit or manual assignment.

        The checkpoint records the saving class; loading through a different
        class is an error (``PLSA.load(ensemble_ckpt)`` would silently build the
        wrong estimator).  Loading through :class:`TopicModelBase` itself
        dispatches to the recorded class.
        """
        import json

        with np.load(path, allow_pickle=False) as z:
            saved_class = bytes(z["class_name"]).decode()
            if cls is TopicModelBase:
                target = _find_estimator_class(saved_class)
                if target is None:
                    raise ValueError(
                        "Checkpoint was saved by unknown estimator class "
                        "{!r}".format(saved_class)
                    )
                cls = target
            elif saved_class != cls.__name__:
                raise ValueError(
                    "Checkpoint at {!r} was saved by {!r}; load it with "
                    "{}.load(...) (or TopicModelBase.load(...) to dispatch "
                    "automatically), not {}.load(...)".format(
                        str(path), saved_class, saved_class, cls.__name__
                    )
                )
            params = json.loads(bytes(z["params_json"]).decode())
            model = cls(**{k: v for k, v in params.items() if k in cls().get_params()})
            model.components_ = z["components_"]
            model.embedding_ = z["embedding_"]
            if "history_" in z:
                model.history_ = z["history_"]
        if hasattr(model, "n_components_") or "n_components_" in dir(cls):
            model.n_components_ = model.components_.shape[0]
        return model

    def warm_start_factors(self):
        """The ``(P(z|d), P(w|z))`` tuple accepted by ``init=`` to resume EM."""
        return (np.asarray(self.embedding_), np.asarray(self.components_))

    # -- topic-quality metrics (reference plsa.py:1222-1285) -------------------

    def _n_topics_fitted(self):
        return self.components_.shape[0]

    def _metric_data(self, data):
        """Resolve the corpus the metrics count co-occurrences against.

        ``training_data_`` is ``None`` after fitting on :class:`PreparedCounts`
        (the raw matrix stays host-side by design) and after :meth:`load`; in
        those cases the caller must pass ``data=`` explicitly.
        """
        if data is not None:
            return data
        stored = getattr(self, "training_data_", None)
        if stored is None:
            raise ValueError(
                "No training data is stored on this model (it was fitted on a "
                "PreparedCounts handle, or restored via load()).  Pass the "
                "count matrix explicitly: model.coherence(data=X) / "
                "model.log_lift(data=X)."
            )
        return stored

    def coherence(self, topic_num=None, n_words=20, data=None):
        """Average (or single-topic) coherence of the fitted topics.

        ``data``: count matrix to evaluate against; defaults to the stored
        ``training_data_`` (required explicitly when none is stored).
        """
        if not isinstance(topic_num, int) and topic_num is not None:
            raise ValueError("Topic number must be an integer or None.")
        data = self._metric_data(data)
        if topic_num is None:
            return mean_coherence(self.components_, data, n_words)
        if 0 <= topic_num < self._n_topics_fitted():
            return coherence(self.components_, topic_num, data, n_words)
        raise ValueError(
            "Topic number must be in range 0 to {}".format(self._n_topics_fitted())
        )

    def log_lift(self, topic_num=None, n_words=20, data=None):
        """Average (or single-topic) log lift of the fitted topics.

        ``data``: count matrix to evaluate against; defaults to the stored
        ``training_data_`` (required explicitly when none is stored).
        """
        if not isinstance(topic_num, int) and topic_num is not None:
            raise ValueError("Topic number must be an integer or None.")
        data = self._metric_data(data)
        if topic_num is None:
            return mean_log_lift(self.components_, data, n_words)
        if 0 <= topic_num < self._n_topics_fitted():
            return log_lift(self.components_, topic_num, data, n_words)
        raise ValueError(
            "Topic number must be in range 0 to {}".format(self._n_topics_fitted())
        )


def _find_estimator_class(name):
    """Map a checkpoint's recorded class name to the estimator class."""
    from .. import models as _models

    for mod_name in ("plsa", "streamed", "mesh", "accelerated", "ensemble"):
        mod = getattr(_models, mod_name, None) or __import__(
            "enstop_tpu.models." + mod_name, fromlist=[mod_name]
        )
        obj = getattr(mod, name, None)
        if isinstance(obj, type) and issubclass(obj, TopicModelBase):
            return obj
    return None
