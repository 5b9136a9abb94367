"""Golden parity vs sklearn.cluster.HDBSCAN (the maintained port of the hdbscan
package the reference depends on, enstop_.py:21-23).

For every fixture we require: identical noise masks, identical partitions (up
to label permutation), and matching membership probabilities.  Fixtures cover
euclidean and precomputed metrics, eom and leaf selection, allow_single_cluster
both ways, and topic-vector-shaped data under Hellinger distance (the exact
input the ensemble combiners feed it).
"""

import numpy as np
import pytest

from sklearn.cluster import HDBSCAN as SKHDBSCAN

from enstop_tpu.cluster.distances import all_pairs_hellinger_distance
from enstop_tpu.cluster.hdbscan import HDBSCAN


def _partitions_equal(a, b):
    assert np.array_equal(a == -1, b == -1), "noise masks differ"
    mask = a >= 0
    mapping = {}
    for x, y in zip(a[mask], b[mask]):
        if x in mapping:
            if mapping[x] != y:
                return False
        else:
            mapping[x] = y
    return len(set(mapping.values())) == len(mapping)


def _compare(X, metric="euclidean", **kw):
    """Bit-exact vs sklearn's brute pipeline (what precomputed metrics always
    use; our construction mirrors it including its tie-order quirks), plus
    partition equality vs sklearn's default algorithm (KD-tree Boruvka picks
    different ties but must agree on the clustering)."""
    ours = HDBSCAN(metric=metric, **kw).fit(X)
    sk = SKHDBSCAN(metric=metric, copy=True, algorithm="brute", **kw).fit(
        np.asarray(X, dtype=np.float64)
    )
    np.testing.assert_array_equal(ours.labels_, sk.labels_)
    np.testing.assert_allclose(ours.probabilities_, sk.probabilities_,
                               rtol=1e-8, atol=1e-10)
    if metric != "precomputed":
        sk_auto = SKHDBSCAN(metric=metric, copy=True, **kw).fit(
            np.asarray(X, dtype=np.float64)
        )
        assert _partitions_equal(ours.labels_, sk_auto.labels_), (
            f"partitions differ vs auto algorithm:"
            f"\n ours {ours.labels_}\n sk   {sk_auto.labels_}"
        )


def _blobs(seed, n_blobs, pts, spread, dim=2):
    rng = np.random.RandomState(seed)
    centers = rng.rand(n_blobs, dim) * 6
    return np.vstack([
        centers[i] + rng.randn(pts, dim) * spread * (1 + 0.5 * i)
        for i in range(n_blobs)
    ])


CASES = [
    dict(seed=0, n_blobs=3, pts=14, spread=0.05),
    dict(seed=1, n_blobs=2, pts=20, spread=0.12),
    dict(seed=2, n_blobs=4, pts=10, spread=0.08),
    dict(seed=3, n_blobs=5, pts=9, spread=0.04),
    dict(seed=4, n_blobs=2, pts=30, spread=0.30),  # heavy overlap
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("method", ["eom", "leaf"])
def test_golden_euclidean(case, method):
    X = _blobs(**case)
    _compare(X, min_samples=3, min_cluster_size=4,
             cluster_selection_method=method)


@pytest.mark.parametrize("case", CASES[:3])
@pytest.mark.parametrize("asc", [False, True])
def test_golden_allow_single_cluster(case, asc):
    X = _blobs(**case)
    _compare(X, min_samples=3, min_cluster_size=5,
             cluster_selection_method="eom", allow_single_cluster=asc)


def test_golden_single_blob_allow_single_cluster():
    """The pure-blob case: hdbscan's threshold rule makes only points reaching
    the root's max sibling lambda members — we must reproduce exactly that."""
    rng = np.random.RandomState(7)
    X = rng.randn(40, 3) * 0.05
    for asc in (False, True):
        _compare(X, min_samples=4, min_cluster_size=5,
                 cluster_selection_method="eom", allow_single_cluster=asc)


def test_golden_straggler_noise():
    rng = np.random.RandomState(1)
    X = np.vstack([rng.randn(25, 2) * 0.03,
                   [[5.0, 5.0], [-6.0, 4.0], [6.0, -5.0]]])
    _compare(X, min_samples=3, min_cluster_size=4,
             cluster_selection_method="eom", allow_single_cluster=True)


@pytest.mark.parametrize("min_samples,mcs", [(2, 3), (5, 8), (3, 6)])
def test_golden_param_sweep(min_samples, mcs):
    X = _blobs(seed=11, n_blobs=3, pts=18, spread=0.10)
    for method in ("eom", "leaf"):
        _compare(X, min_samples=min_samples, min_cluster_size=mcs,
                 cluster_selection_method=method)


@pytest.mark.parametrize("method", ["eom", "leaf"])
def test_golden_precomputed_hellinger_topics(method):
    """The ensemble's actual input: stacked topic distributions under Hellinger
    distance, metric='precomputed' (reference enstop_.py:339-345)."""
    rng = np.random.RandomState(5)
    base = rng.dirichlet(np.full(60, 0.2), size=6)
    topics = np.vstack([
        np.abs(base[i % 6] + rng.randn(60) * 0.01) for i in range(48)
    ])
    topics /= topics.sum(1, keepdims=True)
    dmat = np.asarray(all_pairs_hellinger_distance(topics.astype(np.float32)),
                      dtype=np.float64)
    dmat = (dmat + dmat.T) / 2
    np.fill_diagonal(dmat, 0.0)
    _compare(dmat, metric="precomputed", min_samples=3, min_cluster_size=4,
             cluster_selection_method=method)


def test_golden_duplicate_points():
    """Exact duplicates give infinite lambdas; hdbscan propagates them."""
    rng = np.random.RandomState(9)
    X = _blobs(seed=9, n_blobs=2, pts=12, spread=0.06)
    X = np.vstack([X, X[:3]])  # duplicates
    _compare(X, min_samples=3, min_cluster_size=4,
             cluster_selection_method="eom")


def test_golden_tied_mutual_reachability_edges():
    """Equal-weight MST edges are COMMON under mutual reachability (core
    distances dominate many pairs); dendrogram tie order must mirror
    sklearn's unstable argsort + Prim quirk bit-for-bit."""
    rng = np.random.RandomState(4)
    a = rng.randn(12, 2) * 0.20 + [0.0, 0.0]
    b = rng.randn(12, 2) * 0.20 + [0.55, 0.0]
    far = rng.randn(12, 2) * 0.05 + [8.0, 8.0]
    X = np.vstack([a, b, far])
    for method in ("eom", "leaf"):
        _compare(X, min_samples=3, min_cluster_size=4,
                 cluster_selection_method=method)


def test_golden_fuzz_brute_parity():
    """Randomized sweep: labels AND probabilities bit-identical to sklearn's
    brute pipeline across blob counts, dims, params, methods, asc."""
    rng = np.random.RandomState(77)
    for trial in range(40):
        nb = rng.randint(1, 7)
        X = np.vstack([rng.rand(3) * 10 + rng.randn(rng.randint(4, 30), 3)
                       * rng.uniform(0.01, 0.6) for _ in range(nb)])
        ms, mcs = rng.randint(1, 7), rng.randint(2, 12)
        method = ["eom", "leaf"][trial % 2]
        asc = bool(trial % 3 == 0)
        ours = HDBSCAN(min_samples=ms, min_cluster_size=mcs,
                       cluster_selection_method=method,
                       allow_single_cluster=asc).fit(X)
        sk = SKHDBSCAN(min_samples=ms, min_cluster_size=mcs, copy=True,
                       algorithm="brute", cluster_selection_method=method,
                       allow_single_cluster=asc).fit(X)
        np.testing.assert_array_equal(
            ours.labels_, sk.labels_,
            err_msg=f"trial {trial} (ms={ms} mcs={mcs} {method} asc={asc})")
        np.testing.assert_allclose(ours.probabilities_, sk.probabilities_)
