"""Reference import-path parity: every symbol a reference user can import
keeps working at the same path, including the module-public numba kernel
surface (COO-backed shims — see enstop_tpu/plsa.py)."""

import numpy as np
import scipy.sparse as sp


def _corpus():
    return sp.csr_matrix(
        np.random.RandomState(0).poisson(0.8, (50, 70)).astype(np.int64)
    )


def test_module_level_driver_symbols():
    from enstop_tpu.plsa import PLSA, plsa_fit, plsa_refit, plsa_init
    from enstop_tpu.streamed_plsa import (
        StreamedPLSA, plsa_fit as s_fit, plsa_refit as s_refit,
    )
    from enstop_tpu.block_parallel_plsa import BlockParallelPLSA, plsa_fit as b_fit
    from enstop_tpu.distributed_plsa import DistributedPLSA, plsa_fit as d_fit
    from enstop_tpu.cuda_plsa import GPUPLSA, plsa_fit as c_fit
    from enstop_tpu.enstop_ import EnsembleTopics, ensemble_fit, ensemble_of_topics
    from enstop_tpu.utils import (
        normalize, standardize_input, arr_intersect,
        coherence, mean_coherence, log_lift, mean_log_lift,
    )


def test_gpuplsa_reference_constructor_signature():
    """The reference's GPUPLSA takes a tile-grid shape (cuda_plsa.py:357-368);
    a drop-in user passing it must not break, and sklearn param plumbing must
    round-trip it."""
    from sklearn.base import clone

    from enstop_tpu.cuda_plsa import GPUPLSA

    m = GPUPLSA(n_components=3, n_iter=4, n_row_blocks=4, n_col_blocks=2,
                random_state=0, backend="xla")
    params = m.get_params()
    assert params["n_row_blocks"] == 4 and params["n_col_blocks"] == 2
    m2 = clone(m)
    assert m2.n_row_blocks == 4
    m.fit(_corpus())
    assert m.components_.shape[0] == 3


def test_functional_variant_fits_return_factors():
    """Each variant's module-level plsa_fit returns (P(z|d), P(w|z)) like the
    reference's, at its reference signature."""
    from enstop_tpu import streamed_plsa, block_parallel_plsa, distributed_plsa
    from enstop_tpu import cuda_plsa

    X = _corpus()
    for fit, kw in (
        (streamed_plsa.plsa_fit, dict(block_size=16)),
        (block_parallel_plsa.plsa_fit, dict(n_row_blocks=2, n_col_blocks=2)),
        (distributed_plsa.plsa_fit, {}),
        (cuda_plsa.plsa_fit, {}),
    ):
        zd, wz = fit(X, 3, n_iter=6, random_state=0, **kw)
        assert zd.shape == (50, 3) and wz.shape == (3, 70)
        np.testing.assert_allclose(np.asarray(wz).sum(1), 1.0, rtol=1e-4)
    emb = streamed_plsa.plsa_refit(X, np.asarray(wz), n_iter=4, random_state=0)
    assert emb.shape == (50, 3)


def test_reference_kernel_symbols_match_oracle():
    """The reference's module-public kernel symbols (plsa.py:25-386, 733-816)
    exist at the drop-in path with the numba calling convention — COO arrays
    passed separately, outputs mutated in place AND returned, norm scratch
    arrays filled — and match the oracle's math."""
    import oracle
    from enstop_tpu.plsa import (
        log_likelihood,
        plsa_e_step,
        plsa_m_step,
        plsa_m_step_w_sample_weight,
        plsa_refit_m_step,
    )

    rng = np.random.RandomState(4)
    X = _corpus()
    coo = X.tocoo()
    rows = coo.row.astype(np.int32)
    cols = coo.col.astype(np.int32)
    vals = coo.data.astype(np.float32)
    n, m, k, nnz = X.shape[0], X.shape[1], 4, len(vals)

    pzd = rng.rand(n, k).astype(np.float32)
    pzd /= pzd.sum(1, keepdims=True)
    pwz = rng.rand(k, m).astype(np.float32)
    pwz /= pwz.sum(1, keepdims=True)
    w = rng.uniform(0.5, 2.0, n).astype(np.float32)

    resp = np.zeros((nnz, k), np.float32)
    out = plsa_e_step(rows, cols, vals, pwz, pzd, resp)
    assert out is resp  # in-place + returned, like the numba kernel
    want_resp = oracle.e_step(rows, cols, vals, pwz, pzd)
    np.testing.assert_allclose(resp, want_resp, rtol=1e-5, atol=1e-7)

    # log-likelihood (weighted; the reference takes sample_weight positionally)
    got_ll = log_likelihood(rows, cols, vals, pwz, pzd, w)
    want_ll = oracle.log_likelihood(rows, cols, vals, pwz, pzd, sample_weight=w)
    assert got_ll == pytest_approx(want_ll)

    # unweighted M-step
    pwz_m, pzd_m = pwz.copy(), pzd.copy()
    norm_pwz, norm_pdz = np.zeros(k, np.float32), np.zeros(n, np.float32)
    r1, r2 = plsa_m_step(rows, cols, vals, pwz_m, pzd_m, resp, norm_pwz, norm_pdz)
    assert r1 is pwz_m and r2 is pzd_m
    want_pzd, want_pwz = oracle.m_step(rows, cols, vals, want_resp, n, m)
    np.testing.assert_allclose(pwz_m, want_pwz, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(pzd_m, want_pzd, rtol=1e-4, atol=1e-6)
    assert norm_pwz.sum() > 0 and norm_pdz.sum() > 0  # scratch filled

    # weighted M-step: weight enters P(w|z) only
    pwz_w, pzd_w = pwz.copy(), pzd.copy()
    plsa_m_step_w_sample_weight(rows, cols, vals, pwz_w, pzd_w, resp, w,
                                norm_pwz, norm_pdz)
    want_pzd_w, want_pwz_w = oracle.m_step(rows, cols, vals, want_resp, n, m,
                                           sample_weight=w)
    np.testing.assert_allclose(pwz_w, want_pwz_w, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(pzd_w, want_pzd_w, rtol=1e-4, atol=1e-6)

    # refit M-step: topics frozen, P(z|d) only, weight ignored (reference too)
    pwz_r, pzd_r = pwz.copy(), pzd.copy()
    plsa_refit_m_step(rows, cols, vals, pwz_r, pzd_r, resp, w, norm_pdz)
    np.testing.assert_array_equal(pwz_r, pwz)  # untouched
    want_refit = oracle.refit_m_step(rows, cols, vals, want_resp, n)
    np.testing.assert_allclose(pzd_r, want_refit, rtol=1e-4, atol=1e-6)


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-4)


def test_fit_inner_shim_matches_oracle():
    """plsa_fit_inner runs the reference's exact loop (plsa.py:517-640) from
    caller-supplied factors — trajectory parity vs the numpy oracle."""
    import oracle
    from enstop_tpu.plsa import plsa_fit_inner

    rng = np.random.RandomState(11)
    n, m, k = 40, 30, 4
    X = rng.poisson(0.9, (n, m)).astype(np.float32)
    rows, cols, vals = oracle.to_coo(X)
    pzd = rng.rand(n, k).astype(np.float32)
    pzd /= pzd.sum(axis=1, keepdims=True)
    pwz = rng.rand(k, m).astype(np.float32)
    pwz /= pwz.sum(axis=1, keepdims=True)
    w = np.ones(n, np.float32)

    got_pzd, got_pwz = plsa_fit_inner(
        rows, cols, vals, pwz.copy(), pzd.copy(), w,
        n_iter=12, n_iter_per_test=5, tolerance=1e-9)
    want_pzd, want_pwz, _, _ = oracle.fit(
        rows, cols, vals, pzd, pwz, n, m,
        n_iter=12, n_iter_per_test=5, tolerance=1e-9)
    np.testing.assert_allclose(got_pzd, want_pzd, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got_pwz, want_pwz, rtol=1e-3, atol=1e-5)


def test_refit_inner_shim_preserves_dead_gate():
    """plsa_refit_inner preserves the reference's literal behavior: the
    convergence gate (plsa.py:913) requires a positive log-likelihood, which
    never holds, so exactly n_iter iterations always run and the result on a
    tight tolerance equals the result with tolerance=0."""
    import oracle
    from enstop_tpu.plsa import plsa_refit_inner

    rng = np.random.RandomState(12)
    n, m, k = 30, 25, 3
    X = rng.poisson(1.1, (n, m)).astype(np.float32)
    rows, cols, vals = oracle.to_coo(X)
    topics = rng.rand(k, m).astype(np.float32)
    topics /= topics.sum(axis=1, keepdims=True)
    z0 = rng.rand(n, k).astype(np.float32)
    z0 /= z0.sum(axis=1, keepdims=True)
    w = np.ones(n, np.float32)

    loose = plsa_refit_inner(rows, cols, vals, topics, z0.copy(), w,
                             n_iter=8, n_iter_per_test=2, tolerance=1e6)
    exact = plsa_refit_inner(rows, cols, vals, topics, z0.copy(), w,
                             n_iter=8, n_iter_per_test=2, tolerance=0.0)
    np.testing.assert_array_equal(loose, exact)

    # and it really is the frozen-topic EM: one step matches the oracle
    one = plsa_refit_inner(rows, cols, vals, topics, z0.copy(), w, n_iter=1)
    resp = oracle.e_step(rows, cols, vals, topics.astype(np.float64),
                         z0.astype(np.float64))
    want = oracle.refit_m_step(rows, cols, vals, resp, n)
    np.testing.assert_allclose(one, want, rtol=1e-4, atol=1e-6)


def test_norm_shim():
    from enstop_tpu.plsa import norm

    v = np.array([3.0, 4.0])
    assert norm(v) == 5.0


def test_enstop_namespace_alias():
    """`import enstop` is a literal drop-in: the reference's package
    __init__ surface (enstop/__init__.py:1-7) and its submodule paths all
    resolve to the TPU implementations."""
    import enstop
    import enstop_tpu

    for name in ("PLSA", "StreamedPLSA", "BlockParallelPLSA",
                 "DistributedPLSA", "GPUPLSA", "EnsembleTopics",
                 "log_lift", "mean_log_lift", "coherence", "mean_coherence"):
        assert getattr(enstop, name) is not None, name

    from enstop.plsa import PLSA as P1
    assert P1 is enstop_tpu.PLSA
    from enstop.enstop_ import EnsembleTopics as E1
    assert E1 is enstop_tpu.EnsembleTopics
    from enstop.plsa import plsa_e_step, plsa_fit_inner, norm  # noqa: F401
    from enstop.streamed_plsa import plsa_refit  # noqa: F401
    from enstop.cuda_plsa import GPUPLSA as G1
    from enstop.block_parallel_plsa import BlockParallelPLSA as B1
    from enstop.distributed_plsa import DistributedPLSA as D1
    assert G1 is enstop.GPUPLSA and B1 is enstop.BlockParallelPLSA
    assert D1 is enstop.DistributedPLSA
