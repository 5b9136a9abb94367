"""sklearn estimator contract across every public model class (SURVEY §4a)."""

import numpy as np
import pytest
import scipy.sparse as sp
from sklearn.base import clone

from conftest import make_corpus
from enstop_tpu import (
    PLSA,
    BlockParallelPLSA,
    DistributedPLSA,
    EnsembleTopics,
    StreamedPLSA,
    TPUPLSA,
)

ALL_CLASSES = [
    PLSA,
    StreamedPLSA,
    BlockParallelPLSA,
    DistributedPLSA,
    TPUPLSA,
    EnsembleTopics,
]


def _fast_params(cls):
    p = {"n_components": 3, "n_iter": 8, "random_state": 0}
    if cls is EnsembleTopics:
        p.update(n_starts=4, min_samples=2, min_cluster_size=3)
    return p


@pytest.fixture(scope="module")
def X():
    return sp.csr_matrix(make_corpus(np.random.RandomState(0), n_docs=50, n_words=60))


@pytest.mark.parametrize("cls", ALL_CLASSES, ids=lambda c: c.__name__)
def test_get_set_params_and_clone(cls):
    model = cls(**_fast_params(cls))
    params = model.get_params()
    assert params["n_components"] == 3
    cloned = clone(model)
    assert cloned.get_params() == params
    model.set_params(n_iter=5)
    assert model.get_params()["n_iter"] == 5


@pytest.mark.parametrize("cls", ALL_CLASSES, ids=lambda c: c.__name__)
def test_fit_transform_contract(cls, X):
    model = cls(**_fast_params(cls))
    emb = model.fit_transform(X)
    k_fit = getattr(model, "n_components_", model.n_components)
    assert emb.shape == (X.shape[0], k_fit)
    assert model.components_.shape == (k_fit, X.shape[1])
    assert model.embedding_ is emb or np.array_equal(model.embedding_, emb)
    assert model.training_data_ is not None
    # fit().transform() path
    t = model.transform(X[:7])
    assert t.shape == (7, k_fit)
    # fit returns self
    assert cls(**_fast_params(cls)).fit(X) is not None


@pytest.mark.parametrize("cls", ALL_CLASSES, ids=lambda c: c.__name__)
def test_metrics_available(cls, X):
    model = cls(**_fast_params(cls)).fit(X)
    assert np.isfinite(model.coherence(n_words=5))
    assert np.isfinite(model.log_lift(n_words=5))


# ---------------------------------------------------------------------------
# sklearn's own estimator-check battery (modern tags API)
# ---------------------------------------------------------------------------

def test_sklearn_estimator_checks_plsa():
    """PLSA passes sklearn's full check battery (SkipTest-marked checks and
    environment-gated ones excepted)."""
    import warnings

    from sklearn.utils.estimator_checks import estimator_checks_generator

    from enstop_tpu import PLSA

    est = PLSA(n_components=3, n_iter=5, random_state=0)
    # weight-vs-repetition equivalence does not hold for pLSA by design:
    # the reference applies sample_weight only to the P(w|z) M-step
    # (plsa.py:232-305), not to the per-document P(z|d) updates, and
    # transform is a stochastic frozen-topic refit — repeating a row is
    # not the same model as weighting it.
    expected_failures = {
        "check_sample_weight_equivalence_on_dense_data":
            "reference pLSA weight semantics are not repetition-equivalent",
        "check_sample_weight_equivalence_on_sparse_data":
            "reference pLSA weight semantics are not repetition-equivalent",
    }
    failed = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for estimator, check in estimator_checks_generator(
                est, expected_failed_checks=expected_failures, mark="skip"):
            name = (getattr(check, "func", check).__name__
                    if hasattr(check, "func") else str(check))
            try:
                check(estimator)
            except Exception as e:
                if type(e).__name__ == "SkipTest":
                    continue
                failed.append((name, type(e).__name__, str(e)[:140]))
    assert not failed, failed


@pytest.mark.parametrize("cls_kw", [
    ("StreamedPLSA", dict(n_components=3, n_iter=5, block_size=16)),
    ("EnsembleTopics", dict(n_components=2, n_starts=2, n_iter=5)),
    ("BlockParallelPLSA", dict(n_components=3, n_iter=5)),
])
def test_estimators_reject_negative_input(cls_kw):
    import enstop_tpu

    name, kw = cls_kw
    Est = getattr(enstop_tpu, name)
    X = np.random.RandomState(0).poisson(1.0, (30, 12)).astype(float)
    X[3, 4] = -1.0
    with pytest.raises(ValueError, match="non-negative"):
        Est(random_state=0, **kw).fit(X)


@pytest.mark.parametrize("cls_kw", [
    ("PLSA", dict(n_components=3, n_iter=5)),
    ("StreamedPLSA", dict(n_components=3, n_iter=5, block_size=16)),
    ("EnsembleTopics", dict(n_components=2, n_starts=2, n_iter=5)),
    ("BlockParallelPLSA", dict(n_components=3, n_iter=5)),
])
def test_transform_checks_feature_count(cls_kw):
    import enstop_tpu

    name, kw = cls_kw
    Est = getattr(enstop_tpu, name)
    X = np.random.RandomState(0).poisson(1.0, (40, 12)).astype(np.int64)
    m = Est(random_state=0, **kw).fit(X)
    assert m.n_features_in_ == 12
    with pytest.raises(ValueError, match="features"):
        m.transform(X[:, :8])


@pytest.mark.parametrize("cls", ALL_CLASSES[:5], ids=lambda c: c.__name__)
def test_fit_positional_sample_weight(cls, X):
    """The reference's `fit(self, X, y=None, sample_weight=None)` positional
    convention (plsa.py:1141) must work on every pLSA estimator."""
    w = np.ones(X.shape[0])
    model = cls(**_fast_params(cls)).fit(X, None, w)
    assert model.components_.shape[0] == 3


def test_all_zero_sample_weights_raise(X):
    with pytest.raises(ValueError, match="weights"):
        PLSA(n_components=3, n_iter=5).fit(X, sample_weight=np.zeros(X.shape[0]))
