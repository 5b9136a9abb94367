"""Coherence / log-lift parity against literal transcriptions of the reference
formulas (utils.py:44-273)."""

import numpy as np
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu.ops.metrics import coherence, log_lift, mean_coherence, mean_log_lift


def _ref_log_lift(topics, z, data, n_words):
    """Reference utils.py:44-117, transcribed."""
    t = topics.astype(np.float64).copy()
    t /= t.sum(axis=1, keepdims=True)
    probs = np.asarray(data.sum(axis=0)).squeeze().astype(np.float64)
    probs /= probs.sum()
    row = t[z]
    if n_words <= 0:
        total = sum(row[w] / probs[w] for w in range(t.shape[1]) if probs[w] > 0)
        return np.log(total / t.shape[1])
    top = np.argsort(row)[-n_words:]
    total = sum(row[w] / probs[w] for w in top if probs[w] > 0)
    return np.log(total / n_words)


def _ref_coherence(topics, z, data, n_words):
    """Reference utils.py:160-240, transcribed (sorted-array intersections)."""
    csc = sp.csc_matrix(data)
    n_docs_per_word = np.asarray((data > 0).sum(axis=0)).squeeze()
    top = np.argsort(topics[z])[-n_words:]
    total = 0.0
    for i in range(n_words - 1):
        w = top[i]
        if n_docs_per_word[w] == 0:
            continue
        docs_w = csc.indices[csc.indptr[w]: csc.indptr[w + 1]]
        for j in range(i + 1, n_words):
            v = top[j]
            docs_v = csc.indices[csc.indptr[v]: csc.indptr[v + 1]]
            co = len(np.intersect1d(docs_w, docs_v))
            total += np.log((co + 1.0) / n_docs_per_word[w])
    return total


def _topics(rng, k, m):
    t = rng.dirichlet(np.full(m, 0.3), size=k)
    return t.astype(np.float64)


def test_log_lift_matches_reference_formula(rng):
    X = sp.csr_matrix(make_corpus(rng, n_docs=40, n_words=60, seed=2))
    topics = _topics(rng, 4, 60)
    for z in range(4):
        for n_words in (10, -1):
            got = log_lift(topics, z, X, n_words=n_words)
            want = _ref_log_lift(topics, z, X, n_words)
            assert np.isclose(got, want, rtol=1e-10), (z, n_words)
    got = mean_log_lift(topics, X, n_words=10)
    want = np.mean([_ref_log_lift(topics, z, X, 10) for z in range(4)])
    assert np.isclose(got, want, rtol=1e-10)


def test_coherence_matches_reference_formula(rng):
    X = sp.csr_matrix(make_corpus(rng, n_docs=40, n_words=60, seed=3))
    topics = _topics(rng, 4, 60)
    for z in range(4):
        got = coherence(topics, z, X, n_words=8)
        want = _ref_coherence(topics, z, X, 8)
        assert np.isclose(got, want, rtol=1e-10), z
    got = mean_coherence(topics, X, n_words=8)
    want = np.mean([_ref_coherence(topics, z, X, 8) for z in range(4)])
    assert np.isclose(got, want, rtol=1e-10)
