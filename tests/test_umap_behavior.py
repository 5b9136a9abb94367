"""Behavioral gates for the mini-UMAP (VERDICT round-2 item 6).

umap-learn is not installable in this environment, so instead of golden
embeddings the gates pin the *properties the ensemble pipeline relies on*
(reference enstop_.py:385-394: 5D Hellinger UMAP -> HDBSCAN -> merged topics):

* neighborhood preservation — sklearn's trustworthiness of the embedding
  w.r.t. the input metric must be high (umap-learn's embeddings are);
* the full hellinger_umap combiner must recover the TRUE number of stable
  topic groups across seeds, group counts, and duplication levels — the
  end-to-end behavior the reference pipeline exhibits on ensemble stacks;
* determinism given random_state.
"""

import numpy as np
import pytest

from sklearn.manifold import trustworthiness

from enstop_tpu.cluster.distances import all_pairs_hellinger_distance
from enstop_tpu.cluster.umap import umap_embed
from enstop_tpu.models.ensemble import generate_combined_topics_hellinger_umap


def _topic_stack(seed, n_groups, copies, n_words=80, noise=0.01):
    """Ensemble-like stack: n_groups latent topics, `copies` noisy repeats each
    (what n_runs bootstrap fits produce)."""
    rng = np.random.RandomState(seed)
    protos = rng.dirichlet(np.full(n_words, 0.15), size=n_groups)
    rows = []
    for i in range(n_groups * copies):
        q = np.abs(protos[i % n_groups] + rng.randn(n_words) * noise)
        rows.append(q / q.sum())
    return np.asarray(rows, dtype=np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_embedding_trustworthiness(seed):
    """The 5D embedding must preserve Hellinger neighborhoods (trustworthiness
    close to 1 on structured data — the property HDBSCAN depends on)."""
    T = _topic_stack(seed, n_groups=5, copies=10)
    dmat = np.asarray(all_pairs_hellinger_distance(T), dtype=np.float64)
    dmat = (dmat + dmat.T) / 2
    np.fill_diagonal(dmat, 0)
    emb = umap_embed(dmat=dmat, n_components=5, n_neighbors=10,
                     random_state=seed)
    tw = trustworthiness(dmat, emb, n_neighbors=8, metric="precomputed")
    assert tw > 0.9, f"trustworthiness {tw:.3f}"


@pytest.mark.parametrize("seed,n_groups,copies", [
    (0, 4, 12), (1, 6, 8), (2, 3, 16), (3, 8, 6), (4, 5, 10),
])
def test_combiner_recovers_groups(seed, n_groups, copies):
    """End-to-end hellinger_umap combiner on ensemble-like stacks: every
    latent group must be recovered by a close stable topic.  Leaf selection
    (the reference's choice) may split a noisy group into sub-leaves, so the
    count gate is a band, not an equality — over-splits must stay bounded and
    every stable topic must sit close to a true prototype."""
    T = _topic_stack(seed, n_groups, copies)
    stable = generate_combined_topics_hellinger_umap(
        T, min_samples=3, min_cluster_size=4, random_state=seed,
    )
    found = stable.shape[0]
    assert n_groups <= found <= 2 * n_groups, (
        f"found {found} stable topics, expected ~{n_groups}"
    )
    np.testing.assert_allclose(stable.sum(axis=1), 1.0, rtol=1e-5)
    rng = np.random.RandomState(seed)
    protos = rng.dirichlet(np.full(T.shape[1], 0.15), size=n_groups)
    protos = protos / protos.sum(1, keepdims=True)
    d = np.sqrt(((np.sqrt(stable[:, None, :]) - np.sqrt(protos[None, :, :])) ** 2
                 ).sum(-1)) / np.sqrt(2)
    # every prototype covered by some stable topic, and every stable topic is
    # near a prototype (no junk topics).  The sqrt-mean-square merge over noisy
    # copies lands ~0.34 Hellinger from the latent proto on this fixture;
    # random topic pairs sit ~0.8+ — the gate separates the two regimes.
    assert d.min(axis=0).max() < 0.45, "a latent group was not recovered"
    assert d.min(axis=1).max() < 0.45, "a stable topic matches no latent group"
    # and all groups are covered through nearest-proto assignment
    assert set(d.argmin(axis=1).tolist()) == set(range(n_groups))


def test_combiner_exact_count_when_well_separated():
    """With tight groups and modest duplication the combiner must find exactly
    the latent count."""
    T = _topic_stack(21, 5, 8, noise=0.004)
    stable = generate_combined_topics_hellinger_umap(
        T, min_samples=3, min_cluster_size=4, random_state=0,
    )
    assert stable.shape[0] == 5, f"found {stable.shape[0]}"


def test_embedding_deterministic():
    T = _topic_stack(7, 4, 10)
    dmat = np.asarray(all_pairs_hellinger_distance(T), dtype=np.float64)
    dmat = (dmat + dmat.T) / 2
    np.fill_diagonal(dmat, 0)
    e1 = umap_embed(dmat=dmat, n_components=5, n_neighbors=10, random_state=42)
    e2 = umap_embed(dmat=dmat, n_components=5, n_neighbors=10, random_state=42)
    np.testing.assert_array_equal(e1, e2)


def test_embedding_separates_groups_better_than_noise():
    """Within-group embedding distances must be far below between-group ones
    (the separation HDBSCAN leaf selection needs)."""
    T = _topic_stack(11, 5, 10)
    labels = np.arange(50) % 5
    dmat = np.asarray(all_pairs_hellinger_distance(T), dtype=np.float64)
    dmat = (dmat + dmat.T) / 2
    np.fill_diagonal(dmat, 0)
    emb = umap_embed(dmat=dmat, n_components=5, n_neighbors=10, random_state=0)
    diff = emb[:, None, :] - emb[None, :, :]
    ed = np.sqrt((diff ** 2).sum(-1))
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(50, dtype=bool)
    within = ed[same & off_diag].mean()
    between = ed[~same].mean()
    assert between > 3 * within, f"between {between:.3f} vs within {within:.3f}"


# ---------------------------------------------------------------------------
# device-layout SGD (the compiled fori_loop program used on TPU) must pass the
# same behavioral gates as the numpy path
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 2])
def test_device_layout_trustworthiness(seed):
    T = _topic_stack(seed, n_groups=5, copies=10)
    dmat = np.asarray(all_pairs_hellinger_distance(T), dtype=np.float64)
    dmat = (dmat + dmat.T) / 2
    np.fill_diagonal(dmat, 0)
    emb = umap_embed(dmat=dmat, n_components=5, n_neighbors=10,
                     random_state=seed, layout="device")
    tw = trustworthiness(dmat, emb, n_neighbors=8, metric="precomputed")
    assert tw > 0.9, f"trustworthiness {tw:.3f}"


def test_device_layout_combiner_recovers_groups(monkeypatch):
    """End-to-end combiner gate with the device SGD forced (what TPU runs)."""
    import enstop_tpu.models.ensemble as ens
    from enstop_tpu.cluster.umap import umap_embed as _ue

    monkeypatch.setattr(
        ens, "umap_embed",
        lambda *a, **k: _ue(*a, **{**k, "layout": "device"}),
    )
    n_groups, copies, seed = 4, 12, 0
    T = _topic_stack(seed, n_groups, copies)
    stable = ens.generate_combined_topics_hellinger_umap(
        T, min_samples=3, min_cluster_size=4, random_state=seed,
    )
    found = stable.shape[0]
    assert n_groups <= found <= 2 * n_groups, f"found {found}"
    rng = np.random.RandomState(seed)
    protos = rng.dirichlet(np.full(T.shape[1], 0.15), size=n_groups)
    protos = protos / protos.sum(1, keepdims=True)
    d = np.sqrt(((np.sqrt(stable[:, None, :]) - np.sqrt(protos[None, :, :])) ** 2
                 ).sum(-1)) / np.sqrt(2)
    assert d.min(axis=0).max() < 0.45
    assert d.min(axis=1).max() < 0.45
    assert set(d.argmin(axis=1).tolist()) == set(range(n_groups))


def test_device_layout_deterministic():
    T = _topic_stack(7, 4, 10)
    dmat = np.asarray(all_pairs_hellinger_distance(T), dtype=np.float64)
    dmat = (dmat + dmat.T) / 2
    np.fill_diagonal(dmat, 0)
    e1 = umap_embed(dmat=dmat, n_components=5, n_neighbors=10, random_state=42,
                    layout="device")
    e2 = umap_embed(dmat=dmat, n_components=5, n_neighbors=10, random_state=42,
                    layout="device")
    np.testing.assert_array_equal(e1, e2)


def test_vectorized_smooth_knn_bit_identical_to_scalar(rng):
    """The vectorized rho/sigma search and fuzzy-set fill must be
    BIT-identical to the per-row scalar algorithm (each row's lo/hi/mid
    sequence is unchanged, f64 throughout) — this is why the host pipeline
    could be vectorized with zero combiner-parity risk."""
    import numpy as np

    from enstop_tpu.cluster.umap import (
        SMOOTH_K_TOLERANCE, MIN_K_DIST_SCALE, fuzzy_simplicial_set,
        smooth_knn_dist,
    )

    def scalar_smooth_knn(knn_dists, n_neighbors, n_iter=64):
        target = np.log2(n_neighbors)
        n = knn_dists.shape[0]
        rho = np.zeros(n)
        sigma = np.zeros(n)
        mean_all = knn_dists.mean() or 1.0
        for i in range(n):
            row = knn_dists[i]
            nonzero = row[row > 0]
            rho[i] = nonzero[0] if nonzero.size else 0.0
            lo, hi, mid = 0.0, np.inf, 1.0
            for _ in range(n_iter):
                val = np.exp(-np.maximum(row[1:] - rho[i], 0.0) / mid).sum()
                if abs(val - target) < SMOOTH_K_TOLERANCE:
                    break
                if val > target:
                    hi = mid
                    mid = (lo + hi) / 2.0
                else:
                    lo = mid
                    mid = mid * 2 if hi == np.inf else (lo + hi) / 2.0
            sigma[i] = max(mid, MIN_K_DIST_SCALE * (row.mean() or mean_all))
        return rho, sigma

    for seed, n, k in ((0, 37, 10), (1, 64, 15), (2, 12, 15)):
        r = np.random.RandomState(seed)
        pts = r.rand(n, 6)
        dmat = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
        nn = min(k, n - 1)
        knn_idx = np.argsort(dmat, axis=1)[:, : nn + 1]
        knn_d = np.take_along_axis(dmat, knn_idx, axis=1)
        # a duplicated point gives a row with zero nearest distance
        dmat2 = dmat.copy(); dmat2[0] = dmat2[1]; dmat2[:, 0] = dmat2[:, 1]

        got_rho, got_sig = smooth_knn_dist(knn_d, nn)
        want_rho, want_sig = scalar_smooth_knn(knn_d, nn)
        np.testing.assert_array_equal(got_rho, want_rho)
        np.testing.assert_array_equal(got_sig, want_sig)

        W = fuzzy_simplicial_set(dmat, nn)
        assert W.shape == (n, n)
        np.testing.assert_array_equal(W, W.T)
        assert (W >= 0).all() and (W <= 1 + 1e-12).all()
