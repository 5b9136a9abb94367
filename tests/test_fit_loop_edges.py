"""Fit-loop edge cases: degenerate iteration counts and schedules."""

import numpy as np
import pytest

from enstop_tpu.ops import em as em_ops
from enstop_tpu.ops.fit import em_fit_loop
from enstop_tpu.ops.init import plsa_init


def _loop(X, pzd, pwz, n_iter, npt, tol=0.001):
    def step(state):
        zd, wz, ll = em_ops.em_step_dense(X, state[0], state[1])
        return (zd, wz), ll

    def ll_of(state):
        return em_ops.log_likelihood_dense(X, state[0], state[1])

    return em_fit_loop(step, ll_of, (pzd, pwz), n_iter, npt, tol)


@pytest.mark.parametrize("n_iter,npt", [(0, 10), (1, 10), (3, 100), (5, 1)])
def test_degenerate_schedules(small_corpus, n_iter, npt):
    pzd, pwz = plsa_init(small_corpus, 3, rng=np.random.RandomState(0))
    res = _loop(small_corpus, pzd, pwz, n_iter, npt)
    assert 0 <= int(res.n_steps) <= n_iter
    assert np.isfinite(float(res.final_ll))
    if n_iter == 0:
        np.testing.assert_array_equal(np.asarray(res.state[0]), pzd)


def test_npt_one_tests_every_iteration(small_corpus):
    pzd, pwz = plsa_init(small_corpus, 3, rng=np.random.RandomState(0))
    res = _loop(small_corpus, pzd, pwz, 20, 1, tol=0.0)
    assert int(res.n_steps) == 20
    assert int(res.n_tests) == 21  # init + one per iteration


def test_folded_loop_matches_unfolded_exactly():
    """em_fit_loop_folded must reproduce em_fit_loop bit-for-bit: same test
    values, step counts, and returned state — across early stops, cap-landing
    test points, npt=1, and n_iter=0."""
    import numpy as np
    import jax.numpy as jnp
    from conftest import make_corpus
    from enstop_tpu.ops import em as em_ops
    from enstop_tpu.ops.fit import em_fit_loop, em_fit_loop_folded
    from enstop_tpu.ops.init import plsa_init

    X = make_corpus(np.random.RandomState(0), seed=51)
    pzd, pwz = plsa_init(X, 4, rng=np.random.RandomState(1))
    Xj = jnp.asarray(X)

    def step(state):
        zd, wz, ll = em_ops.em_step_dense(Xj, state[0], state[1])
        return (zd, wz), ll

    def ll_of(state):
        return em_ops.log_likelihood_dense(Xj, state[0], state[1])

    for n_iter, npt, tol in [(25, 5, 0.01), (21, 10, 0.001), (7, 1, 0.5),
                             (30, 7, 1e-9), (0, 5, 0.01), (1, 10, 0.01)]:
        a = em_fit_loop(step, ll_of, (pzd, pwz), n_iter, npt, tol)
        b = em_fit_loop_folded(step, step, ll_of, (pzd, pwz), n_iter, npt, tol)
        assert int(a.n_steps) == int(b.n_steps), (n_iter, npt, tol)
        assert int(a.n_tests) == int(b.n_tests), (n_iter, npt, tol)
        np.testing.assert_allclose(
            np.asarray(a.ll_trace)[: int(a.n_tests)],
            np.asarray(b.ll_trace)[: int(b.n_tests)],
            rtol=1e-6, err_msg=str((n_iter, npt, tol)),
        )
        # the fold compiles the chunk boundaries differently -> last-ulp
        # associativity drift on near-zero entries; trajectories stay 1e-6
        np.testing.assert_allclose(np.asarray(a.state[0]), np.asarray(b.state[0]),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(a.state[1]), np.asarray(b.state[1]),
                                   rtol=1e-4, atol=1e-7)
