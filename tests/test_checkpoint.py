"""Checkpoint/resume and fit observability."""

import numpy as np
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu import PLSA


def test_history_and_fit_info(rng, tmp_path):
    X = sp.csr_matrix(make_corpus(rng, seed=3))
    model = PLSA(n_components=4, n_iter=30, n_iter_per_test=5, random_state=0)
    model.fit(X)
    assert model.history_.ndim == 1 and len(model.history_) >= 2
    # trajectory is (weakly) increasing — EM monotonicity
    assert model.history_[-1] >= model.history_[0]
    assert model.n_iter_ >= 1
    assert model.fit_info_["nnz_k_updates_per_s"] > 0


def test_save_load_roundtrip(rng, tmp_path):
    X = sp.csr_matrix(make_corpus(rng, seed=4))
    model = PLSA(n_components=4, n_iter=10, random_state=0).fit(X)
    p = tmp_path / "ckpt.npz"
    model.save(p)
    restored = PLSA.load(p)
    np.testing.assert_array_equal(restored.components_, model.components_)
    np.testing.assert_array_equal(restored.embedding_, model.embedding_)
    assert restored.n_components == 4
    # restored model can transform (components_ is all transform needs)
    t = restored.transform(X[:5])
    assert t.shape == (5, 4)


def test_warm_start_resume(rng):
    X = sp.csr_matrix(make_corpus(rng, seed=5))
    m1 = PLSA(n_components=4, n_iter=5, n_iter_per_test=100, random_state=0).fit(X)
    # resume from checkpointed factors: LL must continue improving
    m2 = PLSA(n_components=4, init=m1.warm_start_factors(), n_iter=40,
              n_iter_per_test=5, random_state=0).fit(X)
    assert m2.history_[-1] > m1.history_[-1]
