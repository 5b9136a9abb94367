"""Clustering stack: distances, HDBSCAN, mini-UMAP."""

import numpy as np
import pytest

from enstop_tpu.cluster.distances import (
    all_pairs_hellinger_distance,
    all_pairs_kl_divergence,
    hellinger,
)
from enstop_tpu.cluster.hdbscan import HDBSCAN, hdbscan_labels
from enstop_tpu.cluster.umap import umap_embed


def _dirichlet_rows(rng, n, dim, alpha=0.5):
    return rng.dirichlet(np.full(dim, alpha), size=n)


def test_hellinger_matrix_matches_pairwise(rng):
    T = _dirichlet_rows(rng, 12, 30)
    D = all_pairs_hellinger_distance(T)
    for i in range(12):
        for j in range(12):
            want = hellinger(T[i], T[j])
            assert D[i, j] == pytest.approx(want, abs=2e-3)
    assert np.allclose(np.diag(D), 0)
    assert np.allclose(D, D.T, atol=1e-6)


def test_kl_matrix_matches_scalar(rng):
    T = _dirichlet_rows(rng, 8, 20)
    T[T < 0.01] = 0.0  # introduce zeros to exercise the both-positive rule
    D = all_pairs_kl_divergence(T)

    def kl(a, b):
        mask = (a > 0) & (b > 0)
        return np.sum(a[mask] * (np.log2(a[mask]) - np.log2(b[mask])))

    for i in range(8):
        for j in range(8):
            assert D[i, j] == pytest.approx(kl(T[i], T[j]), abs=2e-3)


def test_distance_matrices_match_f64_at_ensemble_scale(rng):
    """The combiner distance matmuls run at Precision.HIGHEST so the on-TPU
    pipeline feeds HDBSCAN the same matrices the CPU-tested golden pipeline
    sees (bf16 DEFAULT would perturb them ~1e-3 and scramble last-ulp
    dendrogram tie order).  Gate: f32-ulp agreement with a straight f64
    numpy computation at real ensemble scale (n_runs*k rows)."""
    n_rows, vocab = 16 * 20, 4000  # n_runs=16, k=20
    T = _dirichlet_rows(rng, n_rows, vocab, alpha=0.1).astype(np.float32)

    D = all_pairs_hellinger_distance(T)
    T64 = T.astype(np.float64)
    sq = np.sqrt(T64)
    sim = sq @ sq.T
    l1 = T64.sum(axis=1)
    want = np.sqrt(np.maximum(0.0, 1.0 - sim / np.sqrt(np.outer(l1, l1))))
    np.fill_diagonal(want, 0.0)
    assert np.abs(D - want).max() < 1e-5

    T[T < 1e-4] = 0.0  # exercise the both-positive mask in the KL path
    K = all_pairs_kl_divergence(T)
    T64 = T.astype(np.float64)
    want_kl = np.empty((n_rows, n_rows))
    logT = np.where(T64 > 0, np.log2(np.maximum(T64, 1e-300)), 0.0)
    pos = (T64 > 0).astype(np.float64)
    want_kl = (T64 * logT) @ pos.T - np.where(T64 > 0, T64, 0.0) @ logT.T
    np.fill_diagonal(want_kl, 0.0)
    assert np.abs(K - want_kl).max() < 1e-4


def _three_blobs(rng, per=20, dim=3, spread=0.05):
    centers = np.array([[0.0] * dim, [5.0] * dim, [-5.0] * dim])
    pts = np.vstack([c + rng.randn(per, dim) * spread for c in centers])
    truth = np.repeat(np.arange(3), per)
    return pts, truth


def test_hdbscan_finds_well_separated_blobs(rng):
    pts, truth = _three_blobs(rng)
    labels, probs = hdbscan_labels(X=pts, min_samples=5, min_cluster_size=5,
                                   cluster_selection_method="leaf")
    # leaf selection takes the finest granularity: at least one cluster per blob,
    # and no cluster may span two blobs (purity).
    assert labels.max() + 1 >= 3
    for c in range(labels.max() + 1):
        assert len(np.unique(truth[labels == c])) == 1
    covered = {np.unique(truth[labels == c])[0] for c in range(labels.max() + 1)}
    assert covered == {0, 1, 2}
    assert (probs[labels >= 0] > 0).all()
    assert probs.max() <= 1.0 + 1e-9


def test_hdbscan_precomputed_matches_vector_input(rng):
    pts, _ = _three_blobs(rng)
    diff = pts[:, None, :] - pts[None, :, :]
    dmat = np.sqrt((diff ** 2).sum(-1))
    l1 = HDBSCAN(min_samples=5, min_cluster_size=5,
                 cluster_selection_method="leaf").fit_predict(pts)
    l2 = HDBSCAN(min_samples=5, min_cluster_size=5, metric="precomputed",
                 cluster_selection_method="leaf").fit_predict(dmat)
    np.testing.assert_array_equal(l1, l2)


def test_hdbscan_single_blob_allow_single_cluster(rng):
    pts = rng.randn(40, 3) * 0.1
    labels, probs = hdbscan_labels(
        X=pts, min_samples=5, min_cluster_size=5,
        cluster_selection_method="leaf", allow_single_cluster=True,
    )
    assert labels.max() >= 0  # at least one cluster found
    labels2, _ = hdbscan_labels(
        X=pts, min_samples=5, min_cluster_size=5,
        cluster_selection_method="leaf", allow_single_cluster=False,
    )
    # without allow_single_cluster a single homogeneous blob may be all noise
    assert labels2.max() <= labels.max()


def test_hdbscan_eom_selection(rng):
    pts, truth = _three_blobs(rng)
    labels, _ = hdbscan_labels(X=pts, min_samples=5, min_cluster_size=5,
                               cluster_selection_method="eom")
    assert labels.max() + 1 == 3


def test_umap_embeds_and_separates(rng):
    # three groups of near-identical distributions
    protos = _dirichlet_rows(rng, 3, 50, alpha=0.2)
    noise = 0.02
    rows = []
    for p in protos:
        for _ in range(15):
            q = p + rng.uniform(0, noise, 50)
            rows.append(q / q.sum())
    T = np.array(rows)
    emb = umap_embed(X=T, n_components=5, n_neighbors=10, random_state=0)
    assert emb.shape == (45, 5)
    assert np.isfinite(emb).all()
    # groups should be tighter within than across
    d01 = np.linalg.norm(emb[0] - emb[1])
    d_cross = np.linalg.norm(emb[0] - emb[20])
    assert d01 < d_cross


def test_umap_then_hdbscan_recovers_groups(rng):
    protos = _dirichlet_rows(rng, 4, 60, alpha=0.2)
    rows = []
    for p in protos:
        for _ in range(12):
            q = p + rng.uniform(0, 0.01, 60)
            rows.append(q / q.sum())
    T = np.array(rows)
    emb = umap_embed(X=T, n_components=5, n_neighbors=10, random_state=0)
    # min_samples=4 = the round-1 effective neighbor rank: core distance is now
    # the hdbscan-package convention (min_samples-th neighbor counting self)
    labels, _ = hdbscan_labels(X=emb, min_samples=4, min_cluster_size=4,
                               cluster_selection_method="leaf",
                               allow_single_cluster=True)
    assert labels.max() + 1 == 4
