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
