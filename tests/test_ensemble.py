"""EnsembleTopics: end-to-end stable-topic discovery on structured corpora."""

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu import EnsembleTopics
from enstop_tpu.models.ensemble import (
    ensemble_fit,
    ensemble_of_topics,
    generate_combined_topics_hellinger,
    generate_combined_topics_hellinger_umap,
    generate_combined_topics_kl,
    nmf_topics,
    plsa_topics,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(7)
    return make_corpus(rng, n_docs=120, n_words=100, avg_doc_len=60, n_topics_true=4)


def test_plsa_topics_worker(corpus):
    t = plsa_topics(sp.csr_matrix(corpus), 4, random_state=0, n_iter=20)
    assert t.shape == (4, corpus.shape[1])
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-4)


def test_nmf_topics_worker(corpus):
    t = nmf_topics(sp.csr_matrix(corpus), 4, random_state=0)
    assert t.shape == (4, corpus.shape[1])
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-4)
    assert (t >= 0).all()


def test_ensemble_of_topics_shapes(corpus):
    X = sp.csr_matrix(corpus)
    for parallelism in ("weights", "resample"):
        stack = ensemble_of_topics(
            X, 3, n_runs=4, parallelism=parallelism, random_state=0, n_iter=15
        )
        assert stack.shape == (12, corpus.shape[1])
        np.testing.assert_allclose(stack.sum(axis=1), 1.0, atol=1e-3)


def _topic_stack(corpus, n_runs=8, k=4):
    return ensemble_of_topics(
        sp.csr_matrix(corpus), k, n_runs=n_runs, parallelism="weights",
        random_state=0, n_iter=30,
    )


def test_combiners_produce_probability_topics(corpus):
    stack = _topic_stack(corpus)
    for combiner in (
        generate_combined_topics_kl,
        generate_combined_topics_hellinger,
    ):
        stable = combiner(stack, min_samples=3, min_cluster_size=4)
        assert stable.ndim == 2 and stable.shape[1] == corpus.shape[1]
        assert stable.shape[0] >= 1
        np.testing.assert_allclose(stable.sum(axis=1), 1.0, atol=1e-4)
    stable = generate_combined_topics_hellinger_umap(
        stack, min_samples=3, min_cluster_size=4, random_state=0
    )
    assert stable.shape[0] >= 1
    np.testing.assert_allclose(stable.sum(axis=1), 1.0, atol=1e-4)


def test_ensemble_estimator_end_to_end(corpus):
    X = sp.csr_matrix(corpus)
    model = EnsembleTopics(
        n_components=4, n_starts=6, n_iter=30, min_samples=3, min_cluster_size=4,
        random_state=42,
    )
    emb = model.fit_transform(X)
    assert model.n_components_ == model.components_.shape[0]
    assert 1 <= model.n_components_ <= 24
    assert emb.shape == (corpus.shape[0], model.n_components_)
    np.testing.assert_allclose(emb.sum(axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(model.components_.sum(axis=1), 1.0, atol=1e-3)

    # recovers roughly the true topic count on a well-structured corpus
    assert 2 <= model.n_components_ <= 8

    t = model.transform(X[:15])
    assert t.shape == (15, model.n_components_)

    # metrics work on the discovered topics
    assert np.isfinite(model.coherence(n_words=8))
    assert np.isfinite(model.log_lift(n_words=8))


def test_ensemble_nmf_backend(corpus):
    X = sp.csr_matrix(corpus)
    model = EnsembleTopics(
        n_components=4, model="nmf", n_starts=4, min_samples=2, min_cluster_size=3,
        random_state=0,
    )
    emb = model.fit_transform(X)
    assert emb.shape[0] == corpus.shape[0]
    assert (model.components_ >= 0).all()


def test_ensemble_lift_factor(corpus):
    X = sp.csr_matrix(corpus)
    m1 = EnsembleTopics(n_components=4, n_starts=4, random_state=1, n_iter=20).fit(X)
    m2 = EnsembleTopics(
        n_components=4, n_starts=4, random_state=1, n_iter=20, lift_factor=2
    ).fit(X)
    # lift sharpens topics: max prob should not decrease on average
    assert m2.components_.max(axis=1).mean() >= m1.components_.max(axis=1).mean() - 1e-6


def test_sharded_parallelism_runs_on_device_mesh(corpus):
    """All bootstrap fits as one SPMD program over the 8-device CPU mesh."""
    import scipy.sparse as sp

    X = sp.csr_matrix(corpus)
    stack = ensemble_of_topics(
        X, 3, n_runs=8, parallelism="sharded", random_state=0, n_iter=15
    )
    assert stack.shape == (24, corpus.shape[1])
    np.testing.assert_allclose(stack.sum(axis=1), 1.0, atol=1e-3)
    # sharded and weights modes draw different RNG streams but must produce
    # comparably structured topics (finite, normalized, non-degenerate)
    assert np.isfinite(stack).all()
    assert (stack >= 0).all()


def test_sharded_matches_weights_given_same_draws(corpus):
    """With bootstrap off and an identical EXPLICIT init, sharded == sequential
    weights (the two fan-outs run the same math; random-stream alignment is
    not part of the contract — the weights path generates inits on device)."""
    import scipy.sparse as sp

    from enstop_tpu.ops.init import plsa_init

    X = sp.csr_matrix(corpus)
    init = plsa_init(X, 3, rng=np.random.RandomState(7))
    s1 = ensemble_of_topics(
        X, 3, n_runs=4, parallelism="sharded", random_state=7, n_iter=12,
        bootstrap=False, init=init,
    )
    s2 = ensemble_of_topics(
        X, 3, n_runs=4, parallelism="weights", random_state=7, n_iter=12,
        bootstrap=False, init=init,
    )
    np.testing.assert_allclose(s1, s2, rtol=5e-3, atol=1e-5)


def test_unknown_parallelism_rejected(corpus):
    import scipy.sparse as sp
    with pytest.raises(ValueError, match="parallelism"):
        ensemble_of_topics(sp.csr_matrix(corpus), 3, parallelism="bogus")


def test_batched_kernel_matches_per_run(corpus):
    """The batched multi-run kernel must reproduce per-run sequential EM
    exactly (same inits, same bootstrap weights)."""
    import scipy.sparse as sp
    from enstop_tpu.ops import em as em_ops
    from enstop_tpu.ops.pallas_batch import batched_em_fit, pick_batch_block_shape
    from enstop_tpu.ops.data import pad_dense_counts, pad_factors, pad_vector
    from enstop_tpu.ops.init import plsa_init

    X = sp.csr_matrix(corpus.astype(np.int64))
    R, k = 3, 4
    bd, bw = pick_batch_block_shape(*X.shape)
    Xd, n, m = pad_dense_counts(X, row_multiple=bd, col_multiple=bw)
    rng = np.random.RandomState(0)
    zds, wzs, ws = [], [], []
    for _ in range(R):
        pzd, pwz = plsa_init(X, k, rng=rng)
        zd, wz = pad_factors(pzd, pwz, Xd.shape[0], Xd.shape[1])
        zds.append(zd)
        wzs.append(wz)
        ws.append(pad_vector(rng.multinomial(n, np.full(n, 1.0 / n)).astype(np.float32),
                             Xd.shape[0]))
    zds, wzs, ws = np.stack(zds), np.stack(wzs), np.stack(ws)

    zf, wf = batched_em_fit(Xd, zds, wzs, ws, 5)
    for r in range(R):
        zd_r, wz_r = zds[r], wzs[r]
        for _ in range(5):
            zd_r, wz_r, _ = em_ops.em_step_dense(Xd, zd_r, wz_r, sample_weight=ws[r])
        np.testing.assert_allclose(np.asarray(zf)[r], np.asarray(zd_r), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(wf)[r], np.asarray(wz_r), rtol=1e-4, atol=1e-6)


def test_ensemble_nndsvd_init(corpus):
    """Data-dependent init must work through the device-resident weights path."""
    import scipy.sparse as sp

    model = EnsembleTopics(n_components=3, n_starts=4, init="nndsvd", n_iter=10,
                           min_samples=2, min_cluster_size=3, random_state=0)
    emb = model.fit_transform(sp.csr_matrix(corpus))
    assert np.isfinite(emb).all()


def test_ensemble_accepts_prepared_counts(corpus):
    import scipy.sparse as sp
    from enstop_tpu.ops.driver import prepare_counts

    prep = prepare_counts(sp.csr_matrix(corpus.astype(np.int64)), standardize=False)
    model = EnsembleTopics(n_components=3, n_starts=4, n_iter=10, min_samples=2,
                           min_cluster_size=3, random_state=0)
    emb = model.fit_transform(prep)
    assert emb.shape[0] == corpus.shape[0]
    assert model.training_data_ is None


def test_device_merge_matches_numpy(rng):
    """The on-device sqrt-mean^2 merge must match the numpy rule exactly."""
    import jax.numpy as jnp

    from enstop_tpu.models.ensemble import _merge_topics_by_label

    T = rng.rand(48, 300).astype(np.float32)
    T /= T.sum(axis=1, keepdims=True)
    labels = rng.randint(-1, 5, 48)  # includes noise points
    weights = rng.rand(48).astype(np.float64)
    weights[labels == 2] = 0.0  # zero-weight cluster exercises the fallback
    a = _merge_topics_by_label(jnp.asarray(T), labels, weights=weights)
    b = _merge_topics_by_label(T, labels, weights=weights)
    assert isinstance(a, np.ndarray) and a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7)
    c = _merge_topics_by_label(jnp.asarray(T), labels)
    d = _merge_topics_by_label(T, labels)
    np.testing.assert_allclose(c, d, rtol=2e-5, atol=1e-7)


def test_ensemble_of_topics_returns_writable_numpy(corpus):
    """Public API parity: the reference returns a writable numpy array
    (enstop_.py:231); the device-resident stack is internal to ensemble_fit."""
    from enstop_tpu.models.ensemble import ensemble_of_topics

    topics = ensemble_of_topics(
        sp.csr_matrix(corpus.astype(np.int64)), 3, n_runs=2, n_iter=5,
        random_state=0,
    )
    assert isinstance(topics, np.ndarray)
    topics[0] = 0.0  # must be writable, like the reference's vstack output
    topics += 1.0


def test_ensemble_rejects_sample_weight():
    """The reference's EnsembleTopics.fit has no sample_weight (enstop_.py:753)
    and errors loudly; silently dropping weights would return an unweighted
    fit the caller believes is weighted."""
    import pytest

    X = sp.csr_matrix(
        np.random.RandomState(0).poisson(1.0, (30, 20)).astype(np.int64))
    with pytest.raises(TypeError, match="sample_weight"):
        EnsembleTopics(n_components=2, n_starts=2, n_iter=5).fit(
            X, sample_weight=np.ones(30))


# ---------------------------------------------------------------------------
# topology-aware routing (VERDICT r04 item 4) + honest joblib/dask (item 5)
# ---------------------------------------------------------------------------

def test_resolve_parallelism_routing(monkeypatch):
    from enstop_tpu.models import ensemble as ens

    # single device: auto -> weights (sharded is measured ~2x slower there)
    monkeypatch.setattr(ens, "_n_devices", lambda: 1)
    assert ens.resolve_parallelism("auto") == "weights"
    # several devices: auto -> sharded (one SPMD program over the mesh)
    monkeypatch.setattr(ens, "_n_devices", lambda: 8)
    assert ens.resolve_parallelism("auto") == "sharded"
    # a single run cannot shard
    assert ens.resolve_parallelism("auto", n_runs=1) == "weights"
    # sparse corpora route to the SELL fan-out regardless of topology
    assert ens.resolve_parallelism("auto", backend="sparse") == "weights"
    # non-plsa models fall back to the reference's materialized resample
    assert ens.resolve_parallelism("auto", model="nmf") == "resample"
    # explicit strings are honored unchanged
    for p in ("weights", "sharded", "resample", "none", "joblib", "dask"):
        assert ens.resolve_parallelism(p, n_runs=8) == p
    # runs that cannot divide across >1 device must NOT route to sharded:
    # the SPMD program would degenerate to the measured-slower 1-shard mode
    assert ens.resolve_parallelism("auto", n_runs=11) == "weights"  # prime > 8
    monkeypatch.setattr(ens, "_n_devices", lambda: 2)
    assert ens.resolve_parallelism("auto", n_runs=5) == "weights"
    assert ens.resolve_parallelism("auto", n_runs=6) == "sharded"


def test_explicit_sharded_rejects_sparse(monkeypatch):
    """There is no sharded SELL variant: the explicit string must fail loudly
    at validation (ValueError), not deep in the fan-out with AttributeError."""
    from enstop_tpu.models import ensemble as ens

    monkeypatch.setattr(ens, "_n_devices", lambda: 8)
    with pytest.raises(ValueError, match="SELL"):
        ens.resolve_parallelism("sharded", backend="sparse")

    from enstop_tpu.ops.sell import prepare_sell

    X = sp.csr_matrix(
        np.random.RandomState(0).poisson(1.0, (30, 20)).astype(np.float32))
    prepared = prepare_sell(X, standardize=False)
    with pytest.raises(ValueError, match="SELL"):
        ens.resolve_parallelism("sharded", prepared=prepared)
    with pytest.raises(ValueError, match="SELL"):
        ensemble_fit(prepared, 2, n_starts=2, n_iter=5,
                     parallelism="sharded")


def test_sharded_path_threads_precision(corpus):
    """precision must reach the sharded bootstrap fits (review r05): with the
    pallas inner and identical draws, 'fast' (bf16 responsibilities) must
    produce different topics than 'default' — equality would mean the knob
    was silently dropped on the sharded route."""
    from enstop_tpu.models.ensemble import _ensemble_of_topics_device

    X = sp.csr_matrix(corpus)
    kw = dict(n_runs=4, parallelism="sharded", backend="pallas",
              bootstrap=False, n_iter=8, random_state=7)
    t_default = np.asarray(
        _ensemble_of_topics_device(X, 3, precision="default", **kw))
    t_fast = np.asarray(
        _ensemble_of_topics_device(X, 3, precision="fast", **kw))
    assert t_default.shape == t_fast.shape
    assert np.isfinite(t_fast).all()
    assert not np.array_equal(t_default, t_fast)


def test_explicit_sharded_on_one_device_warns(monkeypatch):
    from enstop_tpu.models import ensemble as ens

    monkeypatch.setattr(ens, "_n_devices", lambda: 1)
    with pytest.warns(UserWarning, match="sharded.*slower|slower.*sharded"):
        ens.resolve_parallelism("sharded")
    # but auto never warns (it routed away from the slow mode)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert ens.resolve_parallelism("auto") == "weights"


def test_joblib_thread_pool_matches_sequential(corpus):
    """parallelism='joblib' on the CPU backend is a REAL thread fan-out
    (reference enstop_.py:209-229) and must be run-for-run identical to the
    sequential resample path given the same random_state (seeds are drawn
    up front, so thread scheduling cannot perturb any run's stream)."""
    X = sp.csr_matrix(corpus)
    kw = dict(n_runs=3, random_state=11, n_iter=10)
    seq = ensemble_of_topics(X, 3, parallelism="resample", n_jobs=1, **kw)
    pooled = ensemble_of_topics(X, 3, parallelism="joblib", n_jobs=3, **kw)
    np.testing.assert_array_equal(seq, pooled)
    dask = ensemble_of_topics(X, 3, parallelism="dask", n_jobs=2, **kw)
    np.testing.assert_array_equal(seq, dask)


def test_joblib_nmf_cd_is_host_bound_even_on_device_backends(corpus, monkeypatch):
    """model='nmf' with solver='cd' is sklearn host work: the joblib thread
    pool must engage (without the device-bound warning) even when the jax
    backend is an accelerator, while model='plsa' still warns+serializes."""
    import warnings as _w

    from enstop_tpu.models import ensemble as ens

    X = sp.csr_matrix(corpus)
    kw = dict(n_runs=3, random_state=11, n_iter=10)
    seq = ensemble_of_topics(X, 3, parallelism="resample", n_jobs=1,
                             model="nmf", solver="cd", **kw)

    monkeypatch.setattr(ens.jax, "default_backend", lambda: "tpu")
    with _w.catch_warnings():
        _w.simplefilter("error")
        pooled = ensemble_of_topics(X, 3, parallelism="joblib", n_jobs=3,
                                    model="nmf", solver="cd", **kw)
    np.testing.assert_array_equal(seq, pooled)

    with pytest.warns(UserWarning, match="device-bound"):
        ensemble_of_topics(X, 3, parallelism="joblib", n_jobs=3,
                           model="nmf", solver="mu", **kw)


def test_auto_default_runs_end_to_end(corpus):
    """The estimator default is 'auto'; on the 8-virtual-device test mesh it
    routes to the sharded SPMD program and must fit fine end-to-end."""
    X = sp.csr_matrix(corpus)
    m = EnsembleTopics(n_components=3, n_starts=4, n_iter=15, random_state=0)
    assert m.parallelism == "auto"
    emb = m.fit_transform(X)
    assert emb.shape[0] == corpus.shape[0]
    assert np.isfinite(m.components_).all()


@pytest.mark.parametrize("n_runs,seed", [(3, 5), (6, 23), (8, 41)])
def test_sharded_trajectory_equality_across_shard_counts(n_runs, seed):
    """VERDICT r04 item 7: fuzzed mesh-vs-single-chip trajectory equality for
    the runs-sharded ensemble program.  n_runs of 3/6/8 land on 3/6/8 shards
    of the 8-device mesh (incl. non-power-of-two), and with bootstrap off and
    an identical explicit init every shard's fit must match the sequential
    weights path run-for-run."""
    r = np.random.RandomState(seed)
    corpus = make_corpus(r, n_docs=40 + 7 * n_runs, n_words=60 + 5 * seed,
                         avg_doc_len=40, n_topics_true=3)
    X = sp.csr_matrix(corpus)
    from enstop_tpu.ops.init import plsa_init

    init = plsa_init(X, 3, rng=np.random.RandomState(seed))
    sharded = ensemble_of_topics(
        X, 3, n_runs=n_runs, parallelism="sharded", random_state=seed,
        n_iter=12, bootstrap=False, init=init,
    )
    sequential = ensemble_of_topics(
        X, 3, n_runs=n_runs, parallelism="weights", random_state=seed,
        n_iter=12, bootstrap=False, init=init,
    )
    assert sharded.shape == (n_runs * 3, X.shape[1])
    np.testing.assert_allclose(sharded, sequential, rtol=5e-3, atol=1e-5)
