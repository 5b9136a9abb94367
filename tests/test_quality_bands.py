"""Published quality bands for all six estimators on a hard hermetic proxy.

The reference's behavioral gold standard is its 20-Newsgroups notebook
(cells 17-25; BASELINE.md: pLSA ARI 0.2764/AMI 0.4341, EnsTop ARI 0.3368/
AMI 0.4784).  The real corpus is unavailable offline (tests/test_real_20ng.py
wires it and skips), so this module pins expected quality BANDS on a fixed
synthetic corpus built to be 20NG-hard: 60% of tokens come from a shared Zipf
background (stop-word-like mass) and documents are genuine topic mixtures
(alpha 0.35), pushing recovery into the reference's real-data ARI range
instead of clean-synthetic territory.

Measured on this exact corpus (seed 777, 500x1200, 6 topics, ~38.6k nnz):

  PLSA / Streamed / BlockParallel / Distributed(dense+sparse) / TPUPLSA:
      ARI 0.4277, AMI 0.4148  (identical across all six fit paths — same
      init, same schedule, same math)
  EnsembleTopics (8 starts): ARI 0.2992, AMI 0.3430, n_components_ = 5

Bands are set ~0.1 below measured so legitimate numeric drift (jax PRNG or
accumulation-order changes) passes while a quality regression fails.
"""

import warnings

import numpy as np
import pytest
from sklearn.metrics import adjusted_mutual_info_score, adjusted_rand_score

from enstop_tpu import (
    PLSA,
    BlockParallelPLSA,
    DistributedPLSA,
    EnsembleTopics,
    StreamedPLSA,
    TPUPLSA,
)
from enstop_tpu.synthetic import synthetic_corpus


@pytest.fixture(scope="module")
def hard_corpus():
    return synthetic_corpus(
        n_docs=500, n_words=1200, n_topics=6, tokens_per_doc=90,
        doc_topic_alpha=0.35, background_weight=0.6, seed=777,
    )


@pytest.fixture(scope="module")
def plsa_pred(hard_corpus):
    X, _ = hard_corpus
    emb = PLSA(n_components=6, n_iter=60, random_state=0).fit_transform(X)
    return np.argmax(emb, axis=1)


def _fit_pred(model, X):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # TPUPLSA interpret-mode notice on CPU
        emb = model.fit_transform(X)
    return np.argmax(np.asarray(emb), axis=1)


@pytest.mark.parametrize(
    "name,make",
    [
        ("plsa", lambda: PLSA(n_components=6, n_iter=60, random_state=0)),
        ("streamed", lambda: StreamedPLSA(n_components=6, n_iter=60,
                                          block_size=128, random_state=0)),
        ("block_parallel", lambda: BlockParallelPLSA(
            n_components=6, n_iter=60, n_row_blocks=4, n_col_blocks=2,
            random_state=0)),
        ("distributed_dense", lambda: DistributedPLSA(
            n_components=6, n_iter=60, random_state=0)),
        ("distributed_sparse", lambda: DistributedPLSA(
            n_components=6, n_iter=60, random_state=0, layout="sparse")),
        ("tpu", lambda: TPUPLSA(n_components=6, n_iter=60, random_state=0)),
    ],
)
def test_plsa_variant_quality_band(hard_corpus, plsa_pred, name, make):
    """Every pLSA fit path clears the band AND matches the flat PLSA's
    clustering (identical init => identical trajectory across backends)."""
    X, labels = hard_corpus
    pred = _fit_pred(make(), X)
    ari = adjusted_rand_score(labels, pred)
    ami = adjusted_mutual_info_score(labels, pred)
    assert ari > 0.30, f"{name}: ARI {ari:.4f} below band (measured 0.4277)"
    assert ami > 0.30, f"{name}: AMI {ami:.4f} below band (measured 0.4148)"
    cross = adjusted_rand_score(plsa_pred, pred)
    assert cross > 0.95, f"{name}: diverged from flat PLSA (cross-ARI {cross:.4f})"


def test_ensemble_quality_band(hard_corpus):
    X, labels = hard_corpus
    model = EnsembleTopics(n_components=6, n_starts=8, n_iter=60,
                           min_samples=3, min_cluster_size=4, random_state=0)
    pred = _fit_pred(model, X)
    ari = adjusted_rand_score(labels, pred)
    ami = adjusted_mutual_info_score(labels, pred)
    assert 4 <= model.n_components_ <= 8, model.n_components_
    assert ari > 0.15, f"ensemble ARI {ari:.4f} below band (measured 0.2992)"
    assert ami > 0.20, f"ensemble AMI {ami:.4f} below band (measured 0.3430)"
