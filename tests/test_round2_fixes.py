"""Regression tests for round-2 fixes: checkpoint class checks, PreparedCounts
metric guards, and NMF alpha regularization parity (VERDICT.md items 7/9)."""

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu import PLSA, EnsembleTopics
from enstop_tpu.models.base import TopicModelBase
from enstop_tpu.ops.driver import prepare_counts
from enstop_tpu.ops.nmf import nmf_fit_mu


# ---------------------------------------------------------------------------
# load() class checks
# ---------------------------------------------------------------------------

def test_load_rejects_wrong_class(rng, tmp_path):
    X = sp.csr_matrix(make_corpus(rng, seed=11))
    model = PLSA(n_components=3, n_iter=5, random_state=0).fit(X)
    p = tmp_path / "plsa.npz"
    model.save(p)
    with pytest.raises(ValueError, match="saved by 'PLSA'"):
        EnsembleTopics.load(p)


def test_load_base_class_dispatch(rng, tmp_path):
    X = sp.csr_matrix(make_corpus(rng, seed=12))
    model = PLSA(n_components=3, n_iter=5, random_state=0).fit(X)
    p = tmp_path / "plsa.npz"
    model.save(p)
    restored = TopicModelBase.load(p)
    assert type(restored) is PLSA
    np.testing.assert_array_equal(restored.components_, model.components_)


# ---------------------------------------------------------------------------
# PreparedCounts / load() metric guards
# ---------------------------------------------------------------------------

def test_metrics_clear_error_without_training_data(rng):
    X = sp.csr_matrix(make_corpus(rng, seed=13))
    model = PLSA(n_components=3, n_iter=10, random_state=0)
    prep = prepare_counts(X)
    model.fit(prep)
    assert model.training_data_ is None
    with pytest.raises(ValueError, match="Pass the count matrix explicitly"):
        model.coherence()
    with pytest.raises(ValueError, match="Pass the count matrix explicitly"):
        model.log_lift()
    # explicit data= works and matches a normal fit's metric contract
    c = model.coherence(data=X)
    l = model.log_lift(data=X)
    assert np.isfinite(c) and np.isfinite(l)


def test_metrics_explicit_data_matches_stored(rng):
    # integer counts pass through standardize_input unchanged, so the stored
    # training_data_ equals the input and data= must reproduce the default
    X = sp.csr_matrix(make_corpus(rng, seed=14).astype(np.int64))
    model = PLSA(n_components=3, n_iter=10, random_state=0).fit(X)
    assert model.coherence() == model.coherence(data=model.training_data_)
    assert model.log_lift() == model.log_lift(data=model.training_data_)


# ---------------------------------------------------------------------------
# NMF alpha regularization (reference enstop_.py:137-154)
# ---------------------------------------------------------------------------

def _small_nmf_problem(seed=21, n=40, m=60, k=4):
    rng = np.random.RandomState(seed)
    X = make_corpus(rng, n_docs=n, n_words=m, seed=seed).astype(np.float64)
    W0 = np.abs(rng.rand(n, k)) + 0.1
    H0 = np.abs(rng.rand(k, m)) + 0.1
    return X, W0, H0


def test_nmf_alpha_changes_fit():
    X, W0, H0 = _small_nmf_problem()
    W_a, H_a = nmf_fit_mu(X, 4, beta_loss=1, n_iter=30, init=(W0, H0), alpha=0.0)
    W_b, H_b = nmf_fit_mu(X, 4, beta_loss=1, n_iter=30, init=(W0, H0), alpha=5.0)
    assert not np.allclose(H_a, H_b)
    # L2 regularization shrinks the factors
    assert np.linalg.norm(H_b) < np.linalg.norm(H_a)


@pytest.mark.parametrize("beta_loss,sk_beta", [(1, "kullback-leibler"), (2, "frobenius")])
def test_nmf_mu_alpha_matches_sklearn(beta_loss, sk_beta):
    """Our regularized MU updates must track sklearn's mu solver given identical
    init and the alpha_W/alpha_H scaling that reproduces the reference's
    unscaled-alpha objective."""
    from sklearn.decomposition import NMF

    X, W0, H0 = _small_nmf_problem()
    alpha = 2.0
    n_iter = 25
    n, m = X.shape

    sk = NMF(
        n_components=4,
        init="custom",
        solver="mu",
        beta_loss=sk_beta,
        alpha_W=alpha / m,
        alpha_H=alpha / n,
        l1_ratio=0.0,
        max_iter=n_iter,
        tol=0.0,
    )
    W_sk = sk.fit_transform(X.copy(), W=W0.copy(), H=H0.copy())
    H_sk = sk.components_

    W_us, H_us = nmf_fit_mu(
        X, 4, beta_loss=beta_loss, n_iter=n_iter, init=(W0, H0), alpha=alpha
    )
    np.testing.assert_allclose(W_us, W_sk, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(H_us, H_sk, rtol=2e-3, atol=1e-5)


def test_ensemble_nmf_alpha_applied(rng):
    """A non-default alpha must change the ensemble's NMF bootstrap topics."""
    from enstop_tpu.models.ensemble import nmf_topics

    X = sp.csr_matrix(make_corpus(rng, seed=22))
    t0 = nmf_topics(X, 3, bootstrap=False, random_state=0, alpha=0.0)
    t1 = nmf_topics(X, 3, bootstrap=False, random_state=0, alpha=10.0)
    assert not np.allclose(t0, t1)
    t_cd0 = nmf_topics(X, 3, bootstrap=False, random_state=0, solver="cd", alpha=0.0)
    t_cd1 = nmf_topics(X, 3, bootstrap=False, random_state=0, solver="cd", alpha=10.0)
    assert not np.allclose(t_cd0, t_cd1)


def test_gpuplsa_positional_constructor_order():
    """Reference positional construction (cuda_plsa.py:357-368):
    GPUPLSA(n_components, init, n_row_blocks, n_col_blocks, n_iter, ...) —
    the tile grid must bind positionally, NOT n_iter."""
    from enstop_tpu.models.accelerated import GPUPLSA

    m = GPUPLSA(10, "random", 4, 4)
    assert m.n_row_blocks == 4 and m.n_col_blocks == 4
    assert m.n_iter == 100 and m.n_iter_per_test == 10
    m2 = GPUPLSA(10, "random", 8, 8, 200)
    assert m2.n_iter == 200 and m2.tolerance == 0.001
