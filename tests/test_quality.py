"""End-to-end model quality: the reference notebook's evaluation, hermetic.

The reference's de-facto integration test is its 20-Newsgroups notebook: fit each
model, cluster documents by argmax topic, and score against ground-truth labels
with ARI/AMI (SURVEY.md §4, §6).  These tests reproduce that shape on a seeded
synthetic corpus with known topic structure.
"""

import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score, adjusted_mutual_info_score

from enstop_tpu import PLSA, EnsembleTopics
from enstop_tpu.synthetic import synthetic_corpus


@pytest.fixture(scope="module")
def labeled_corpus():
    return synthetic_corpus(
        n_docs=600, n_words=1500, n_topics=8, tokens_per_doc=150, seed=42
    )


def test_plsa_recovers_topic_structure(labeled_corpus):
    X, labels = labeled_corpus
    model = PLSA(n_components=8, n_iter=60, random_state=0)
    emb = model.fit_transform(X)
    pred = np.argmax(emb, axis=1)
    ari = adjusted_rand_score(labels, pred)
    ami = adjusted_mutual_info_score(labels, pred)
    # the reference's real-data ARIs are ~0.28 (BASELINE.md); on clean synthetic
    # data with the true k, recovery should be much stronger
    assert ari > 0.5, f"ARI {ari:.3f}"
    assert ami > 0.6, f"AMI {ami:.3f}"


def test_ensemble_quality_at_least_plsa_ballpark(labeled_corpus):
    X, labels = labeled_corpus
    plsa_pred = np.argmax(
        PLSA(n_components=8, n_iter=60, random_state=0).fit_transform(X), axis=1
    )
    ens = EnsembleTopics(
        n_components=8, n_starts=8, n_iter=60, min_samples=3, min_cluster_size=4,
        random_state=0,
    )
    ens_pred = np.argmax(ens.fit_transform(X), axis=1)
    ari_p = adjusted_rand_score(labels, plsa_pred)
    ari_e = adjusted_rand_score(labels, ens_pred)
    # ensemble should find a sensible number of stable topics and be competitive
    assert 4 <= ens.n_components_ <= 16
    assert ari_e > 0.35, f"ensemble ARI {ari_e:.3f} (plsa {ari_p:.3f})"


def test_coherence_improves_with_fitting(labeled_corpus):
    X, labels = labeled_corpus
    short = PLSA(n_components=8, n_iter=2, random_state=0).fit(X)
    long = PLSA(n_components=8, n_iter=60, random_state=0).fit(X)
    # fitted topics should have no worse coherence than a barely-fit model
    assert long.coherence(n_words=10) >= short.coherence(n_words=10) - 5.0
