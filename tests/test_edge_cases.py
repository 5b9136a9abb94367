"""Degenerate-input robustness across the stack."""

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu import PLSA
from enstop_tpu.cluster.hdbscan import hdbscan_labels
from enstop_tpu.models.ensemble import (
    generate_combined_topics_hellinger,
    generate_combined_topics_hellinger_umap,
    generate_combined_topics_kl,
)


def test_identical_topics_through_combiners(rng):
    """An ensemble that converged to one topic everywhere must not crash."""
    base = rng.dirichlet(np.full(50, 0.5))
    stack = np.tile(base, (24, 1)).astype(np.float32)
    stack += rng.uniform(0, 1e-7, stack.shape)
    stack /= stack.sum(1, keepdims=True)
    for combiner in (generate_combined_topics_kl, generate_combined_topics_hellinger):
        out = combiner(stack, min_samples=3, min_cluster_size=4)
        assert out.shape[0] >= 1
        assert np.isfinite(out).all()
    out = generate_combined_topics_hellinger_umap(stack, 3, 4, random_state=0)
    assert out.shape[0] >= 1 and np.isfinite(out).all()


def test_hdbscan_identical_points():
    pts = np.ones((20, 3))
    labels, probs = hdbscan_labels(X=pts, min_samples=3, min_cluster_size=4,
                                   cluster_selection_method="leaf",
                                   allow_single_cluster=True)
    assert np.isfinite(probs).all()


@pytest.mark.parametrize("n,m,k", [(9, 10, 2), (3, 200, 2), (50, 5, 3), (16, 16, 12)])
def test_plsa_extreme_shapes(rng, n, m, k):
    X = make_corpus(np.random.RandomState(1), n_docs=n, n_words=m,
                    avg_doc_len=20, n_topics_true=2)
    emb = PLSA(n_components=k, n_iter=8, random_state=0).fit_transform(
        sp.csr_matrix(X)
    )
    assert emb.shape == (n, k)
    assert np.isfinite(emb).all()


def test_single_document(rng):
    X = np.zeros((1, 30), np.float32)
    X[0, rng.randint(0, 30, 10)] = 1
    emb = PLSA(n_components=2, n_iter=5, random_state=0).fit_transform(
        sp.csr_matrix(X)
    )
    assert emb.shape == (1, 2)
    assert np.isfinite(emb).all()


def test_all_zero_matrix_rejected_or_zero():
    X = sp.csr_matrix((4, 10), dtype=np.float32)
    model = PLSA(n_components=2, n_iter=3, random_state=0)
    # every row is zero -> the fit has nothing to do; embeddings are zero rows
    emb = model.fit_transform(X)
    assert emb.shape == (4, 2)
    assert np.all(emb == 0)


def test_large_k_fit_paths():
    """k far beyond the CUDA reference's comfort zone (its normalize kernel
    capped k at 1024, cuda_plsa.py:135): k=100 on all single-device backends."""
    import numpy as np
    import scipy.sparse as sp
    from conftest import make_corpus
    from enstop_tpu.ops.driver import plsa_fit

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=81,
                                  n_docs=150, n_words=220, avg_doc_len=80))
    for backend in ("xla", "sparse"):
        zd, wz = plsa_fit(X, 100, backend=backend, n_iter=5, random_state=0)
        assert zd.shape == (150, 100) and wz.shape == (100, 220)
        np.testing.assert_allclose(wz.sum(1), 1.0, rtol=1e-3)
        assert np.isfinite(zd).all() and np.isfinite(wz).all()
