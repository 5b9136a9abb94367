"""Numerical parity of the TPU-native EM kernels against the NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from enstop_tpu.ops import coo as coo_ops
from enstop_tpu.ops import em as em_ops
from enstop_tpu.ops.fit import em_fit_loop_traced
from enstop_tpu.ops.init import plsa_init


def _setup(small_corpus, k=6, seed=0):
    X = small_corpus
    rows, cols, vals = oracle.to_coo(X)
    rng = np.random.RandomState(seed)
    pzd, pwz = plsa_init(X, k, init="random", rng=rng)
    return X, rows, cols, vals, pzd, pwz


def test_log_likelihood_matches_oracle(small_corpus):
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    want = oracle.log_likelihood(rows, cols, vals, pwz, pzd)
    got_dense = float(em_ops.log_likelihood_dense(X, pzd, pwz))
    got_coo = float(coo_ops.log_likelihood_coo(rows, cols, vals.astype(np.float32), pzd, pwz))
    assert got_dense == pytest.approx(want, rel=5e-5)
    assert got_coo == pytest.approx(want, rel=5e-5)


def test_single_em_step_matches_oracle(small_corpus):
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    resp = oracle.e_step(rows, cols, vals, pwz, pzd)
    want_zd, want_wz = oracle.m_step(rows, cols, vals, resp, *X.shape)

    got_zd, got_wz, _ = em_ops.em_step_dense(X, pzd, pwz)
    np.testing.assert_allclose(np.asarray(got_zd), want_zd, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), want_wz, rtol=2e-4, atol=1e-6)

    got_zd2, got_wz2, _ = coo_ops.em_step_coo(
        rows, cols, vals.astype(np.float32), pzd, pwz, X.shape[0], X.shape[1]
    )
    np.testing.assert_allclose(np.asarray(got_zd2), want_zd, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz2), want_wz, rtol=2e-4, atol=1e-6)


def test_weighted_em_step_matches_oracle(small_corpus):
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    w = np.random.RandomState(3).uniform(0.5, 2.0, size=X.shape[0]).astype(np.float32)
    resp = oracle.e_step(rows, cols, vals, pwz, pzd)
    want_zd, want_wz = oracle.m_step(rows, cols, vals, resp, *X.shape, sample_weight=w)

    got_zd, got_wz, ll = em_ops.em_step_dense(X, pzd, pwz, sample_weight=w)
    np.testing.assert_allclose(np.asarray(got_zd), want_zd, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), want_wz, rtol=2e-4, atol=1e-6)
    want_ll = oracle.log_likelihood(rows, cols, vals, pwz, pzd, sample_weight=w)
    assert float(ll) == pytest.approx(want_ll, rel=1e-5)


def test_refit_step_matches_oracle(small_corpus):
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    resp = oracle.e_step(rows, cols, vals, pwz, pzd)
    want_zd = oracle.refit_m_step(rows, cols, vals, resp, X.shape[0])
    got_zd, _ = em_ops.refit_step_dense(X, pzd, pwz)
    np.testing.assert_allclose(np.asarray(got_zd), want_zd, rtol=2e-4, atol=1e-6)


def test_e_step_threshold_semantics(small_corpus):
    """The exact COO path must reproduce the pre-normalization threshold cutoff."""
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    thresh = 3e-3  # large enough to actually drop entries on this corpus
    want = oracle.e_step(rows, cols, vals, pwz, pzd, thresh=thresh)
    got = coo_ops.e_step_coo(
        rows, cols, vals.astype(np.float32), pzd, pwz, probability_threshold=thresh
    )
    assert (np.asarray(got) == 0).sum() == (want == 0).sum()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-7)


def test_fit_loop_trajectory_matches_oracle(small_corpus):
    """The compiled while_loop must follow the reference's exact test schedule,
    log-likelihood trajectory, and early-stop iteration count."""
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    n_iter, npt, tol = 40, 5, 0.01
    want_zd, want_wz, want_steps, want_lls = oracle.fit(
        rows, cols, vals, pzd, pwz, *X.shape,
        n_iter=n_iter, n_iter_per_test=npt, tolerance=tol,
    )

    def step(state):
        zd, wz = state
        zd, wz, ll = em_ops.em_step_dense(X, zd, wz)
        return (zd, wz), ll

    def ll_fn(state):
        return em_ops.log_likelihood_dense(X, state[0], state[1])

    (zd, wz), steps, lls, n_tests = em_fit_loop_traced(
        step, ll_fn, (pzd, pwz), n_iter, npt, tol
    )
    assert int(steps) == want_steps
    got_lls = np.asarray(lls)[: int(n_tests)]
    np.testing.assert_allclose(got_lls, np.array(want_lls), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(zd), want_zd, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wz), want_wz, rtol=5e-3, atol=1e-5)


def test_padding_is_absorbing(small_corpus):
    """Zero-padded rows/cols/topics must not change results on the real region."""
    from enstop_tpu.ops.data import pad_dense_counts, pad_factors, unpad_factors

    X = small_corpus
    n, m = X.shape
    k = 6
    pzd, pwz = plsa_init(X, k, init="random", rng=np.random.RandomState(0))

    zd_p, wz_p = pad_factors(pzd, pwz, n_pad=n + 12, m_pad=m + 70, k_multiple=8)
    Xp = np.zeros((n + 12, m + 70), dtype=np.float32)
    Xp[:n, :m] = X

    got_zd, got_wz, ll_p = em_ops.em_step_dense(Xp, zd_p, wz_p)
    want_zd, want_wz, ll = em_ops.em_step_dense(X, pzd, pwz)

    assert float(ll_p) == pytest.approx(float(ll), rel=1e-6)
    uz, uw = unpad_factors(np.asarray(got_zd), np.asarray(got_wz), n, m, k)
    np.testing.assert_allclose(uz, np.asarray(want_zd), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(uw, np.asarray(want_wz), rtol=1e-5, atol=1e-7)
    # padding region must remain exactly zero
    assert np.all(np.asarray(got_zd)[n:] == 0)
    assert np.all(np.asarray(got_wz)[:, m:] == 0)
    assert np.all(np.asarray(got_wz)[k:, :] == 0)


def test_weighted_coo_step_matches_oracle(small_corpus):
    X, rows, cols, vals, pzd, pwz = _setup(small_corpus)
    w = np.random.RandomState(9).uniform(0.5, 3.0, size=X.shape[0]).astype(np.float32)
    resp = oracle.e_step(rows, cols, vals, pwz, pzd)
    want_zd, want_wz = oracle.m_step(rows, cols, vals, resp, *X.shape, sample_weight=w)
    got_zd, got_wz, ll = coo_ops.em_step_coo(
        rows, cols, vals.astype(np.float32), pzd, pwz, X.shape[0], X.shape[1],
        sample_weight=jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(got_zd), want_zd, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), want_wz, rtol=2e-4, atol=1e-6)
    want_ll = oracle.log_likelihood(rows, cols, vals, pwz, pzd, sample_weight=w)
    assert float(ll) == pytest.approx(want_ll, rel=5e-5)


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_em_step_fuzz_shapes(seed):
    """Oracle parity across randomized shapes, topic counts, and weights."""
    from conftest import make_corpus

    r = np.random.RandomState(seed)
    n = int(r.randint(10, 90))
    m = int(r.randint(30, 200))
    k = int(r.randint(2, 9))
    X = make_corpus(r, n_docs=n, n_words=m, avg_doc_len=int(r.randint(15, 60)),
                    n_topics_true=3)
    rows, cols, vals = oracle.to_coo(X)
    pzd, pwz = plsa_init(X, k, rng=np.random.RandomState(seed + 1))
    w = r.uniform(0.1, 4.0, size=n).astype(np.float32) if seed % 2 else None

    resp = oracle.e_step(rows, cols, vals, pwz, pzd)
    want_zd, want_wz = oracle.m_step(rows, cols, vals, resp, n, m, sample_weight=w)
    got_zd, got_wz, ll = em_ops.em_step_dense(X, pzd, pwz, sample_weight=w)
    np.testing.assert_allclose(np.asarray(got_zd), want_zd, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), want_wz, rtol=5e-4, atol=1e-6)
    want_ll = oracle.log_likelihood(rows, cols, vals, pwz, pzd, sample_weight=w)
    assert float(ll) == pytest.approx(want_ll, rel=1e-4)
