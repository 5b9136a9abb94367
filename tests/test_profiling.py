"""Profiling helpers."""

import numpy as np
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu import PLSA
from enstop_tpu.profiling import StepTimer, fit_stats


def test_fit_stats_reports(rng):
    X = sp.csr_matrix(make_corpus(rng, seed=12))
    model = PLSA(n_components=3, n_iter=6, random_state=0).fit(X)
    s = fit_stats(model)
    assert "EM steps" in s and "updates/s" in s


def test_fit_stats_unfitted():
    assert "no fit info" in fit_stats(PLSA())


def test_step_timer(rng):
    t = StepTimer()
    with t.section("a"):
        _ = np.ones(10).sum()
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["b"]["calls"] == 1
    assert rep["a"]["total_s"] >= 0
