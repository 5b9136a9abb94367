"""PLSA estimator: sklearn contract, fit quality, zero-row handling, transform."""

import numpy as np
import pytest
import scipy.sparse as sp

import oracle
from conftest import make_corpus
from enstop_tpu import PLSA
from enstop_tpu.ops.driver import plsa_fit
from enstop_tpu.ops.init import plsa_init


def test_fit_transform_shapes_and_probabilities(small_corpus):
    model = PLSA(n_components=5, random_state=0, n_iter=30)
    emb = model.fit_transform(sp.csr_matrix(small_corpus))
    n, m = small_corpus.shape
    assert emb.shape == (n, 5)
    assert model.components_.shape == (5, m)
    assert model.embedding_ is emb
    # rows are probability distributions
    np.testing.assert_allclose(emb.sum(axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(model.components_.sum(axis=1), 1.0, atol=1e-4)
    assert (emb >= 0).all() and (model.components_ >= 0).all()


def test_fit_matches_oracle_trajectory(small_corpus):
    """Full driver (padding included) must match the reference-semantics oracle."""
    X = small_corpus
    rows, cols, vals = oracle.to_coo(X)
    pzd0, pwz0 = plsa_init(X, 4, rng=np.random.RandomState(7))
    want_zd, want_wz, want_steps, _ = oracle.fit(
        rows, cols, vals, pzd0, pwz0, *X.shape, n_iter=25, n_iter_per_test=5
    )
    got_zd, got_wz, info = plsa_fit(
        sp.csr_matrix(X), 4, init=(pzd0, pwz0),
        n_iter=25, n_iter_per_test=5, random_state=0, return_info=True,
    )
    assert info["n_steps"] == want_steps
    np.testing.assert_allclose(got_zd, want_zd, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(got_wz, want_wz, rtol=5e-3, atol=1e-5)


def test_zero_rows_are_reinserted(small_corpus):
    X = small_corpus.copy()
    X[3] = 0
    X[17] = 0
    model = PLSA(n_components=4, random_state=0, n_iter=15)
    emb = model.fit_transform(sp.csr_matrix(X))
    assert emb.shape[0] == X.shape[0]
    assert np.all(emb[3] == 0) and np.all(emb[17] == 0)
    assert not np.all(emb[4] == 0)


def test_negative_input_rejected(small_corpus):
    X = small_corpus.copy()
    X[0, 0] = -1
    with pytest.raises(ValueError, match="non-negative"):
        PLSA(n_components=3).fit(sp.csr_matrix(X))


def test_transform_embeds_new_documents(rng, small_corpus):
    model = PLSA(n_components=5, random_state=0, n_iter=30)
    model.fit(sp.csr_matrix(small_corpus))
    X_new = make_corpus(rng, n_docs=12, seed=123)
    emb = model.transform(sp.csr_matrix(X_new))
    assert emb.shape == (12, 5)
    np.testing.assert_allclose(emb.sum(axis=1), 1.0, atol=1e-4)


def test_fit_improves_log_likelihood(small_corpus):
    X = sp.csr_matrix(small_corpus)
    pzd0, pwz0 = plsa_init(small_corpus, 5, rng=np.random.RandomState(1))
    _, _, info_short = plsa_fit(X, 5, init=(pzd0, pwz0), n_iter=2, return_info=True)
    _, _, info_long = plsa_fit(X, 5, init=(pzd0, pwz0), n_iter=60, return_info=True)
    assert info_long["log_likelihood"] > info_short["log_likelihood"]


def test_sample_weight_changes_topics(small_corpus):
    X = sp.csr_matrix(small_corpus)
    w = np.ones(X.shape[0], dtype=np.float32)
    w[:10] = 25.0
    m1 = PLSA(n_components=4, random_state=0, n_iter=20).fit(X)
    m2 = PLSA(n_components=4, random_state=0, n_iter=20)
    m2.fit(X, sample_weight=w)
    assert not np.allclose(m1.components_, m2.components_)


def test_dense_input_accepted(small_corpus):
    emb = PLSA(n_components=3, random_state=0, n_iter=10).fit_transform(small_corpus)
    assert emb.shape == (small_corpus.shape[0], 3)


def test_init_variants(small_corpus):
    X = sp.csr_matrix(small_corpus)
    for init in ("random", "nndsvd", "nmf"):
        emb = PLSA(n_components=4, init=init, random_state=0, n_iter=10).fit_transform(X)
        assert np.isfinite(emb).all()


def test_metrics_methods(small_corpus):
    model = PLSA(n_components=4, random_state=0, n_iter=20)
    model.fit(sp.csr_matrix(small_corpus))
    c = model.coherence(n_words=8)
    ll = model.log_lift(n_words=8)
    assert np.isfinite(c) and np.isfinite(ll)
    c0 = model.coherence(topic_num=0, n_words=8)
    assert np.isfinite(c0)
    with pytest.raises(ValueError):
        model.coherence(topic_num=99)


def test_bfloat16_storage_close_to_f32(small_corpus):
    X = sp.csr_matrix(small_corpus)
    pzd0, pwz0 = plsa_init(small_corpus, 4, rng=np.random.RandomState(2))
    zd32, wz32 = plsa_fit(X, 4, init=(pzd0, pwz0), n_iter=15)
    zd16, wz16 = plsa_fit(X, 4, init=(pzd0, pwz0), n_iter=15, x_dtype="bfloat16")
    # bf16 counts (integers < 256) are exact; trajectories should agree closely
    np.testing.assert_allclose(wz16, wz32, rtol=5e-2, atol=1e-4)


def test_prepared_counts_reuse(small_corpus):
    from enstop_tpu.ops.driver import prepare_counts

    # integer counts: standardize_input is a no-op, so the prepared and raw
    # paths see identical data (float inputs are l1-normalized when prepared)
    X = sp.csr_matrix(small_corpus.astype(np.int64))
    prep = prepare_counts(X)
    pzd0, pwz0 = plsa_init(small_corpus, 4, rng=np.random.RandomState(2))
    zd_a, wz_a = plsa_fit(prep, 4, init=(pzd0, pwz0), n_iter=15)
    zd_b, wz_b = plsa_fit(X, 4, init=(pzd0, pwz0), n_iter=15)
    np.testing.assert_allclose(wz_a, wz_b, rtol=1e-5, atol=1e-7)
    # random init works from shape alone
    zd_c, wz_c = plsa_fit(prep, 4, init="random", n_iter=5, random_state=0)
    assert wz_c.shape == (4, small_corpus.shape[1])


def test_estimator_accepts_prepared_counts(small_corpus):
    from enstop_tpu.ops.driver import prepare_counts

    prep = prepare_counts(sp.csr_matrix(small_corpus))
    model = PLSA(n_components=4, n_iter=10, random_state=0)
    emb = model.fit_transform(prep)
    assert emb.shape == (small_corpus.shape[0], 4)
    ref = PLSA(n_components=4, n_iter=10, random_state=0).fit_transform(
        sp.csr_matrix(small_corpus)
    )
    np.testing.assert_allclose(emb, ref, rtol=1e-5, atol=1e-7)


def test_refit_matches_oracle_loop(small_corpus):
    """plsa_refit (frozen topics) vs the oracle refit loop, fixed iterations."""
    from enstop_tpu.ops.driver import plsa_refit

    X = small_corpus
    rows, cols, vals = oracle.to_coo(X)
    rng = np.random.RandomState(11)
    topics = rng.dirichlet(np.full(X.shape[1], 0.3), size=4).astype(np.float32)

    # oracle: same random init for P(z|d) as the driver draws
    from sklearn.utils import check_random_state

    rs = check_random_state(123)
    pzd = rs.rand(X.shape[0], 4)
    pzd /= pzd.sum(axis=1, keepdims=True)
    pzd64 = pzd.astype(np.float64)
    for _ in range(7):
        resp = oracle.e_step(rows, cols, vals, topics.astype(np.float64), pzd64)
        pzd64 = oracle.refit_m_step(rows, cols, vals, resp, X.shape[0])

    got = plsa_refit(
        sp.csr_matrix(X), topics, n_iter=7, n_iter_per_test=100, tolerance=0.0,
        random_state=123, backend="xla",
    )
    np.testing.assert_allclose(got, pzd64, rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_nndsvd_matches_sklearn_canonical(seed):
    """The vectorized sign-split NNDSVD must reproduce sklearn's public
    ``_initialize_nmf(init="nndsvd")`` (the algorithm the reference's init
    was itself taken from) to float64 roundoff, across shapes and k."""
    import scipy.sparse as sp
    from sklearn.decomposition._nmf import _initialize_nmf

    from enstop_tpu.ops.init import nndsvd_init

    r = np.random.RandomState(seed)
    X = sp.csr_matrix(
        r.poisson(0.7, (50 + 11 * seed, 70 + 7 * seed)).astype(float))
    k = 3 + seed % 4
    W, H = _initialize_nmf(X, k, init="nndsvd", random_state=42)
    doc_seed, word_seed = nndsvd_init(X, k, np.random.RandomState(42))
    np.testing.assert_allclose(doc_seed, W, rtol=0, atol=1e-12)
    np.testing.assert_allclose(word_seed, H, rtol=0, atol=1e-12)
