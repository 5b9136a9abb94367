"""StreamedPLSA: out-of-core fit must match the in-core path."""

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu import PLSA, StreamedPLSA
from enstop_tpu.ops.init import plsa_init


def test_streamed_matches_flat_given_identical_init(rng):
    X = make_corpus(rng, n_docs=100, n_words=90, seed=11)
    Xs = sp.csr_matrix(X)
    pzd0, pwz0 = plsa_init(Xs, 4, rng=np.random.RandomState(3))

    flat = PLSA(n_components=4, init=(pzd0, pwz0), n_iter=20, backend="xla").fit(Xs)
    streamed = StreamedPLSA(
        n_components=4, init=(pzd0, pwz0), block_size=32, n_iter=20, backend="xla"
    ).fit(Xs)

    np.testing.assert_allclose(
        streamed.components_, flat.components_, rtol=5e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        streamed.embedding_, flat.embedding_, rtol=5e-3, atol=1e-5
    )


def test_streamed_estimator_api(rng):
    X = make_corpus(rng, n_docs=70, n_words=80, seed=21)
    model = StreamedPLSA(n_components=3, block_size=16, n_iter=15, random_state=0)
    emb = model.fit_transform(sp.csr_matrix(X))
    assert emb.shape == (70, 3)
    np.testing.assert_allclose(emb.sum(axis=1), 1.0, atol=1e-4)
    t = model.transform(sp.csr_matrix(X[:9]))
    assert t.shape == (9, 3)
    np.testing.assert_allclose(t.sum(axis=1), 1.0, atol=1e-4)


def test_streamed_sample_weight(rng):
    X = make_corpus(rng, n_docs=60, n_words=60, seed=5)
    Xs = sp.csr_matrix(X)
    w = np.ones(60, np.float32)
    w[:5] = 30.0
    pzd0, pwz0 = plsa_init(Xs, 3, rng=np.random.RandomState(3))
    flat = PLSA(n_components=3, init=(pzd0, pwz0), n_iter=10, backend="xla")
    flat.fit(Xs, sample_weight=w)
    streamed = StreamedPLSA(n_components=3, init=(pzd0, pwz0), block_size=16,
                            n_iter=10, backend="xla")
    streamed.fit(Xs, sample_weight=w)
    np.testing.assert_allclose(
        streamed.components_, flat.components_, rtol=5e-3, atol=1e-5
    )


def test_tpuplsa_alias(rng):
    from enstop_tpu import GPUPLSA, TPUPLSA

    assert GPUPLSA is TPUPLSA
    X = make_corpus(rng, n_docs=40, n_words=50, seed=9)
    model = TPUPLSA(n_components=3, n_iter=5, random_state=0)
    emb = model.fit_transform(sp.csr_matrix(X))
    assert emb.shape == (40, 3)


def test_pallas_interpret_matches_xla_trajectory(rng):
    """The fused Pallas kernel path (interpret mode off-TPU) must match the XLA
    path exactly — cross-variant equivalence per SURVEY §4c."""
    from enstop_tpu.ops.driver import plsa_fit

    X = make_corpus(rng, n_docs=48, n_words=64, seed=31)
    Xs = sp.csr_matrix(X.astype(np.int64))
    pzd0, pwz0 = plsa_init(Xs, 4, rng=np.random.RandomState(3))
    zd_x, wz_x, info_x = plsa_fit(Xs, 4, init=(pzd0, pwz0), n_iter=8,
                                  backend="xla", return_info=True)
    zd_p, wz_p, info_p = plsa_fit(Xs, 4, init=(pzd0, pwz0), n_iter=8,
                                  backend="pallas", return_info=True)
    assert info_x["n_steps"] == info_p["n_steps"]
    np.testing.assert_allclose(wz_p, wz_x, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(zd_p, zd_x, rtol=1e-4, atol=1e-6)


def test_streamed_refit_matches_dense_trajectory(rng):
    """The streamed refit must follow the dense refit exactly on identical
    init: same convergence schedule, same stopping step, same embedding
    (VERDICT r2 item 5 — the old streamed refit ran a fixed n_iter with no
    convergence testing and no e_step_thresh)."""
    from enstop_tpu.models.streamed_core import streamed_refit_core
    from enstop_tpu.ops.driver import plsa_refit

    X = make_corpus(rng, n_docs=90, n_words=80, seed=31)
    Xs = sp.csr_matrix(X)
    topics = PLSA(n_components=4, n_iter=15, random_state=0,
                  backend="xla").fit(Xs).components_

    for tol, npt in ((0.001, 5), (0.05, 10)):  # tight + loose (early stop)
        dense = plsa_refit(Xs, topics, n_iter=50, n_iter_per_test=npt,
                           tolerance=tol, random_state=np.random.RandomState(7),
                           backend="xla")
        streamed = streamed_refit_core(Xs, topics, block_docs=32, n_iter=50,
                                       n_iter_per_test=npt, tolerance=tol,
                                       random_state=np.random.RandomState(7))
        np.testing.assert_allclose(streamed, dense, rtol=5e-3, atol=1e-5)


def test_block_store_uniform_shapes(rng):
    """All SELL blocks of one store share a single array shape, so the jitted
    per-block step programs compile once per fit — not once per
    content-dependent block shape (each remote compile costs 30s+ here)."""
    from enstop_tpu.models.streamed_core import _BlockStore

    X = sp.csr_matrix(make_corpus(rng, n_docs=257, n_words=120, seed=41))
    store = _BlockStore(X, 32, use_pallas=False)
    assert store.n_blocks == 9  # includes a partial last block
    shapes = {
        (b.row_doc.shape, b.cols_a.shape, b.col_word.shape, b.rows_b.shape)
        for b in store.blocks
    }
    assert len(shapes) == 1, shapes
    total = sum(float(b.vals_a.sum()) for b in store.blocks)
    assert total == pytest.approx(float(X.sum()), rel=1e-6)
    # the tail block's zd/w also pad to the uniform block height, so the
    # per-block step programs specialize exactly once per fit
    from enstop_tpu.models.streamed_core import _pad_block_rows

    tail = np.ones((257 - 8 * 32, 3), np.float32)
    assert _pad_block_rows(tail, 32).shape == (32, 3)
    np.testing.assert_array_equal(_pad_block_rows(tail, 32)[: tail.shape[0]],
                                  tail)


def test_streamed_refit_thresh(rng):
    """A materially-firing e_step_thresh must change the streamed refit the
    same way it changes the resident sparse refit."""
    from enstop_tpu.models.streamed_core import streamed_refit_core
    from enstop_tpu.ops.driver import plsa_refit

    X = make_corpus(rng, n_docs=60, n_words=50, seed=13)
    Xs = sp.csr_matrix(X)
    topics = PLSA(n_components=3, n_iter=10, random_state=0,
                  backend="xla").fit(Xs).components_
    dense = plsa_refit(Xs, topics, n_iter=20, n_iter_per_test=5,
                       tolerance=0.0, e_step_thresh=0.05,
                       random_state=np.random.RandomState(5))
    streamed = streamed_refit_core(Xs, topics, block_docs=16, n_iter=20,
                                   n_iter_per_test=5, tolerance=0.0,
                                   e_step_thresh=0.05,
                                   random_state=np.random.RandomState(5))
    np.testing.assert_allclose(streamed, dense, rtol=5e-3, atol=1e-5)
    # and the thresh must actually have an effect vs no-thresh
    no_thresh = streamed_refit_core(Xs, topics, block_docs=16, n_iter=20,
                                    n_iter_per_test=5, tolerance=0.0,
                                    random_state=np.random.RandomState(5))
    assert np.abs(streamed - no_thresh).max() > 1e-6


def test_streamed_refit_sample_weight_semantics(rng):
    """Reference streamed refit semantics (streamed_plsa.py:713-957):
    sample_weight weights ONLY the convergence log-likelihood — the
    frozen-topic M-step ignores it.  So (a) with tolerance=0 (no early
    stop) weights cannot change the embedding at all, and (b) a uniform
    scalar weight is a no-op even WITH early stopping (the relative-change
    test is scale-invariant)."""
    from enstop_tpu.models.streamed_core import streamed_refit_core

    X = make_corpus(rng, n_docs=70, n_words=60, seed=23)
    Xs = sp.csr_matrix(X)
    topics = PLSA(n_components=4, n_iter=12, random_state=0,
                  backend="xla").fit(Xs).components_

    w = rng.uniform(0.2, 5.0, size=Xs.shape[0]).astype(np.float32)
    base = streamed_refit_core(Xs, topics, block_docs=24, n_iter=15,
                               n_iter_per_test=5, tolerance=0.0,
                               random_state=np.random.RandomState(3))
    weighted = streamed_refit_core(Xs, topics, sample_weight=w,
                                   block_docs=24, n_iter=15,
                                   n_iter_per_test=5, tolerance=0.0,
                                   random_state=np.random.RandomState(3))
    np.testing.assert_array_equal(base, weighted)

    uniform = streamed_refit_core(
        Xs, topics, sample_weight=np.full(Xs.shape[0], 7.0, np.float32),
        block_docs=24, n_iter=50, n_iter_per_test=5, tolerance=0.01,
        random_state=np.random.RandomState(3))
    plain = streamed_refit_core(Xs, topics, block_docs=24, n_iter=50,
                                n_iter_per_test=5, tolerance=0.01,
                                random_state=np.random.RandomState(3))
    np.testing.assert_allclose(uniform, plain, rtol=1e-5, atol=1e-7)


def test_streamed_transform_accepts_sample_weight(rng):
    """Drop-in parity: StreamedPLSA.transform(X, y=None, sample_weight=None)
    (reference streamed_plsa.py:1237) and the functional plsa_refit's
    positional sample_weight (streamed_plsa.py:959)."""
    import inspect

    from enstop_tpu.models.streamed import StreamedPLSA
    from enstop_tpu.streamed_plsa import plsa_refit as alias_refit

    sig = inspect.signature(StreamedPLSA.transform)
    assert list(sig.parameters)[:4] == ["self", "X", "y", "sample_weight"]
    assert list(inspect.signature(alias_refit).parameters)[:3] == [
        "X", "topics", "sample_weight"]

    X = make_corpus(rng, n_docs=40, n_words=30, seed=9)
    Xs = sp.csr_matrix(X)
    model = StreamedPLSA(n_components=3, n_iter=10, block_size=16,
                         random_state=0).fit(Xs)
    emb = model.transform(Xs, sample_weight=np.ones(Xs.shape[0]))
    assert emb.shape == (Xs.shape[0], 3)
    np.testing.assert_allclose(np.asarray(emb).sum(axis=1), 1.0, atol=1e-4)


def test_streamed_pallas_chunk_knob(rng, monkeypatch):
    """ENSTOP_STREAMED_PALLAS=1 routes the streamed fit through the Pallas
    chunk block layout end-to-end (VERDICT r04 weak #7: the branch must be
    reachable, not dead code), matching the SELL-layout trajectory."""
    X = make_corpus(rng, n_docs=70, n_words=60, seed=29)
    Xs = sp.csr_matrix(X)
    pzd0, pwz0 = plsa_init(Xs, 3, rng=np.random.RandomState(5))

    sell = StreamedPLSA(n_components=3, init=(pzd0, pwz0), block_size=24,
                        n_iter=12, backend="xla").fit(Xs)
    monkeypatch.setenv("ENSTOP_STREAMED_PALLAS", "1")
    chunks = StreamedPLSA(n_components=3, init=(pzd0, pwz0), block_size=24,
                          n_iter=12, backend="xla").fit(Xs)
    np.testing.assert_allclose(
        chunks.components_, sell.components_, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        chunks.embedding_, sell.embedding_, rtol=5e-3, atol=1e-5)
