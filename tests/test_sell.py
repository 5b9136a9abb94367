"""Parity tests for the sparse SELL path vs the exact COO oracle.

The COO path (ops/coo.py) is the pinned reference-semantics ground truth,
itself oracle-tested against tests/oracle.py; the SELL step must reproduce it
exactly (same math, different layout), including e_step_thresh and the weighted
asymmetry.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from conftest import make_corpus
from enstop_tpu.ops import coo as coo_ops
from enstop_tpu.ops import sell as sell_ops


def _setup(seed=0, n=37, m=53, k=5, density=0.15, weighted=False):
    rng = np.random.RandomState(seed)
    X = sp.random(n, m, density=density, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 5).astype(np.float32)
    # ensure no all-zero docs (estimators remove them; kernels assume nnz>0 rows)
    for i in np.flatnonzero(np.diff(X.indptr) == 0):
        X[i, rng.randint(m)] = 1.0
    X = sp.csr_matrix(X)
    zd = rng.rand(n, k).astype(np.float32)
    zd /= zd.sum(1, keepdims=True)
    wz = rng.rand(k, m).astype(np.float32)
    wz /= wz.sum(1, keepdims=True)
    w = (rng.rand(n).astype(np.float32) * 2 + 0.1) if weighted else None
    return X, zd, wz, w


def _coo_step(X, zd, wz, w, thresh):
    Xc = X.tocoo()
    return coo_ops.em_step_coo(
        jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
        jnp.asarray(zd), jnp.asarray(wz), X.shape[0], X.shape[1],
        sample_weight=None if w is None else jnp.asarray(w),
        probability_threshold=thresh,
    )


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("segsum", ["gather", "scatter"])
@pytest.mark.parametrize("lane", [8, 128])
def test_sell_step_matches_coo(weighted, segsum, lane):
    X, zd, wz, w = _setup(seed=3, weighted=weighted)
    sides = sell_ops.pack_sell(X, lane=lane, build_tables=(segsum == "gather"))
    dev = sell_ops.device_arrays(sides)
    zd2, wz2, ll2 = sell_ops.em_step_sell(
        dev, jnp.asarray(zd), jnp.asarray(wz),
        w=None if w is None else jnp.asarray(w), segsum=segsum,
    )
    zd1, wz1, ll1 = _coo_step(X, zd, wz, w, 1e-32)
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(zd1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(wz2), np.asarray(wz1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-5)


@pytest.mark.parametrize("thresh", [1e-16, 1e-3, 3e-2])
@pytest.mark.parametrize("weighted", [False, True])
def test_sell_threshold_matches_coo(thresh, weighted):
    """e_step_thresh semantics: products <= thresh drop from numerator AND
    normalizer (reference plsa.py:97-102).  Large thresholds make the cutoff
    fire on many entries, exercising the masked path hard."""
    X, zd, wz, w = _setup(seed=7, weighted=weighted)
    sides = sell_ops.pack_sell(X)
    dev = sell_ops.device_arrays(sides)
    zd2, wz2, ll2 = sell_ops.em_step_sell(
        dev, jnp.asarray(zd), jnp.asarray(wz),
        w=None if w is None else jnp.asarray(w), thresh=thresh,
    )
    zd1, wz1, ll1 = _coo_step(X, zd, wz, w, thresh)
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(zd1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(wz2), np.asarray(wz1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-5)


def test_threshold_changes_result():
    """A firing threshold must actually change the update (guards against a
    silently-inert implementation, VERDICT missing item 3)."""
    X, zd, wz, _ = _setup(seed=9)
    sides = sell_ops.pack_sell(X)
    dev = sell_ops.device_arrays(sides)
    zd_a, wz_a, _ = sell_ops.em_step_sell(dev, jnp.asarray(zd), jnp.asarray(wz))
    zd_b, wz_b, _ = sell_ops.em_step_sell(
        dev, jnp.asarray(zd), jnp.asarray(wz), thresh=3e-2
    )
    assert not np.allclose(np.asarray(wz_a), np.asarray(wz_b))


@pytest.mark.parametrize("segsum", ["gather", "scatter"])
def test_sell_refit_matches_coo(segsum):
    X, zd, wz, _ = _setup(seed=11)
    sides = sell_ops.pack_sell(X, build_tables=(segsum == "gather"))
    dev = sell_ops.device_arrays(sides)
    zd2, ll2 = sell_ops.refit_step_sell(dev, jnp.asarray(zd), jnp.asarray(wz),
                                        segsum=segsum)
    # refit = E step + M step with frozen topics: P(z|d) update only
    Xc = X.tocoo()
    resp = coo_ops.e_step_coo(jnp.asarray(Xc.row), jnp.asarray(Xc.col),
                              jnp.asarray(Xc.data), jnp.asarray(zd), jnp.asarray(wz))
    pzd, _ = coo_ops.m_step_coo(jnp.asarray(Xc.row), jnp.asarray(Xc.col),
                                jnp.asarray(Xc.data), resp, X.shape[0], X.shape[1])
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(pzd), rtol=2e-5, atol=1e-7)


def test_sell_ll_matches_coo():
    X, zd, wz, w = _setup(seed=13, weighted=True)
    sides = sell_ops.pack_sell(X)
    dev = sell_ops.device_arrays(sides)
    ll2 = sell_ops.log_likelihood_sell(dev, jnp.asarray(zd), jnp.asarray(wz),
                                       w=jnp.asarray(w))
    Xc = X.tocoo()
    ll1 = coo_ops.log_likelihood_coo(
        jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
        jnp.asarray(zd), jnp.asarray(wz), jnp.asarray(w))
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-5)


# ---------------------------------------------------------------------------
# fit-level parity (trajectory + early stop vs the NumPy oracle)
# ---------------------------------------------------------------------------

import oracle
from enstop_tpu.ops.driver import plsa_fit, plsa_refit
from enstop_tpu.ops.init import plsa_init
from enstop_tpu.ops.sell import prepare_sell, sell_fit


@pytest.mark.parametrize("thresh", [1e-32])
def test_sparse_fit_trajectory_matches_oracle(thresh):
    Xd = make_corpus(np.random.RandomState(0), seed=17)
    X = sp.csr_matrix(Xd)
    rows, cols, vals = oracle.to_coo(Xd)
    pzd, pwz = plsa_init(X, 4, rng=np.random.RandomState(1))
    n_iter, npt, tol = 30, 5, 0.01
    want_zd, want_wz, want_steps, want_lls = oracle.fit(
        rows, cols, vals, pzd, pwz, *X.shape,
        n_iter=n_iter, n_iter_per_test=npt, tolerance=tol, thresh=thresh,
    )
    prep = prepare_sell(X, standardize=False)  # oracle sees raw counts
    zd, wz, steps, _, lls, n_tests = sell_fit(
        prep, pzd, pwz, n_iter=n_iter, n_iter_per_test=npt, tolerance=tol,
        e_step_thresh=thresh,
    )
    assert int(steps) == want_steps
    np.testing.assert_allclose(
        np.asarray(lls)[: int(n_tests)], np.array(want_lls), rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(zd), want_zd, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wz), want_wz, rtol=5e-3, atol=1e-5)


def test_sparse_multistep_thresholded_matches_oracle():
    """Several consecutive thresholded EM steps must track the oracle state-for-
    state.  (Full-trajectory convergence parity with a firing threshold is not
    well-defined on tiny corpora: any material cutoff eventually zeroes whole
    words, where the reference's log-likelihood is -inf and its NaN convergence
    test never stops — our 1e-30 guard keeps LL finite instead.  The while-loop
    machinery itself is identical and covered at thresh=1e-32 above.)"""
    Xd = make_corpus(np.random.RandomState(0), seed=37)
    X = sp.csr_matrix(Xd)
    rows, cols, vals = oracle.to_coo(Xd)
    pzd, pwz = plsa_init(X, 4, rng=np.random.RandomState(2))
    thresh = 2e-3
    prep = prepare_sell(X, standardize=False)
    dev = prep.dev
    zd_j, wz_j = jnp.asarray(pzd), jnp.asarray(pwz)
    zd_o, wz_o = pzd, pwz
    for step in range(6):
        resp = oracle.e_step(rows, cols, vals, wz_o, zd_o, thresh=thresh)
        zd_o, wz_o = oracle.m_step(rows, cols, vals, resp, *X.shape)
        zd_j, wz_j, _ = sell_ops.em_step_sell(dev, zd_j, wz_j, thresh=thresh)
        np.testing.assert_allclose(np.asarray(zd_j), zd_o, rtol=5e-4, atol=1e-6,
                                   err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(wz_j), wz_o, rtol=5e-4, atol=1e-6,
                                   err_msg=f"step {step}")


def test_plsa_fit_sparse_backend_and_auto_routing():
    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=19))
    zd_a, wz_a = plsa_fit(X, 4, backend="sparse", n_iter=20, random_state=0)
    assert zd_a.shape == (X.shape[0], 4) and wz_a.shape == (4, X.shape[1])
    # a materially-firing e_step_thresh auto-routes backend="auto" to sparse:
    # identical rng stream + identical thresh -> identical result
    zd_b, wz_b = plsa_fit(X, 4, backend="auto", e_step_thresh=1e-16,
                          n_iter=20, random_state=0)
    zd_c, wz_c = plsa_fit(X, 4, backend="sparse", e_step_thresh=1e-16,
                          n_iter=20, random_state=0)
    np.testing.assert_allclose(zd_b, zd_c, rtol=1e-6)
    np.testing.assert_allclose(wz_b, wz_c, rtol=1e-6)


def test_plsa_fit_prepared_sell_reuse():
    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=23))
    prep = prepare_sell(X, standardize=False)  # plsa_fit pads raw matrices as-given
    zd1, wz1 = plsa_fit(prep, 4, n_iter=15, random_state=0)
    zd2, wz2 = plsa_fit(X, 4, backend="sparse", n_iter=15, random_state=0)
    np.testing.assert_allclose(zd1, zd2, rtol=1e-6)
    np.testing.assert_allclose(wz1, wz2, rtol=1e-6)


def test_plsa_refit_sparse_matches_dense_backend():
    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=29))
    _, topics = plsa_fit(X, 4, backend="xla", n_iter=20, random_state=0)
    zd_sparse = plsa_refit(X, topics, backend="sparse", random_state=7)
    zd_dense = plsa_refit(X, topics, backend="xla", random_state=7)
    np.testing.assert_allclose(zd_sparse, zd_dense, rtol=2e-3, atol=1e-5)


def test_plsa_estimator_sparse_backend():
    from enstop_tpu import PLSA

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=31).astype(np.int64))
    model = PLSA(n_components=4, backend="sparse", n_iter=25, random_state=0).fit(X)
    assert model.embedding_.shape == (X.shape[0], 4)
    np.testing.assert_allclose(model.components_.sum(axis=1), 1.0, rtol=1e-4)
    t = model.transform(X[:7])
    assert t.shape == (7, 4)
    # quality sanity: LL improved over the fit
    assert model.history_[-1] > model.history_[0]


def test_pack_sell_empty_and_long_rows():
    """Edge cases: an empty doc and a doc spanning many segments."""
    n, m = 6, 300
    X = sp.lil_matrix((n, m), dtype=np.float32)
    X[0, :250] = 1.0          # long doc: 250 nnz -> 2 segments at lane 128
    X[2, 5] = 3.0
    # doc 1, 3, 4, 5: row 4 left empty deliberately
    X[1, 7] = 1.0
    X[3, 9] = 2.0
    X[5, 1] = 1.0
    X = sp.csr_matrix(X)
    sides = sell_ops.pack_sell(X)
    assert sides.nnz == X.nnz
    # every nonzero is present exactly once
    recon = np.zeros((n, m), np.float32)
    for r in range(sides.row_doc.shape[0]):
        d = sides.row_doc[r]
        for l in range(sides.lane):
            if sides.vals_a[r, l] != 0:
                recon[d, sides.cols_a[r, l]] += sides.vals_a[r, l]
    np.testing.assert_array_equal(recon, X.toarray())

    dev = sell_ops.device_arrays(sides)
    rng = np.random.RandomState(0)
    zd = rng.rand(n, 3).astype(np.float32); zd /= zd.sum(1, keepdims=True)
    wz = rng.rand(3, m).astype(np.float32); wz /= wz.sum(1, keepdims=True)
    zd2, wz2, _ = sell_ops.em_step_sell(dev, jnp.asarray(zd), jnp.asarray(wz))
    zd1, wz1, _ = _coo_step(X, zd, wz, None, 1e-32)
    # empty doc: SELL yields a zero row, COO segment_sum too
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(zd1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(wz2), np.asarray(wz1), rtol=2e-5, atol=1e-7)


def test_pack_sell_bucketed_shapes_stable_across_resamples():
    """Bootstrap resamples of one corpus must pack to IDENTICAL array shapes
    (coarse row buckets, ~3% max waste): shape-keyed compiled fit programs
    are then shared across the ensemble's resample runs instead of paying a
    30s-10min remote compile per run."""
    rng = np.random.RandomState(3)
    X = sp.random(800, 600, density=0.05, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 4).astype(np.float32)
    X = sp.csr_matrix(X)
    shapes = set()
    for _ in range(6):
        B = X[rng.randint(0, X.shape[0], X.shape[0])]
        s = sell_ops.pack_sell(B)
        shapes.add((s.row_doc.shape, s.cols_a.shape, s.col_word.shape,
                    s.rows_b.shape))
    assert len(shapes) == 1, shapes
    # and the bucket padding stays bounded: <= ~6% above the minimum, plus
    # the 128-row floor that keeps tiny programs shareable too
    s = sell_ops.pack_sell(X)
    from enstop_tpu.ops.sell import _bucket_rows
    for R in (40, 130, 1000, 1025, 5000, 100_000, 3_000_000):
        assert _bucket_rows(R) >= R
        assert _bucket_rows(R) <= max(R * 1.07, R + 128)


def test_sparse_refit_batches_share_program_shapes():
    """Serving transform batches of similar (not identical) sizes must reach
    the compiled refit program with IDENTICAL input shapes (bucketed doc rows
    + bucketed segment rows), so one compile serves them all — and the padded
    run must match the unpadded semantics exactly."""
    rng = np.random.RandomState(5)
    X = sp.random(1400, 500, density=0.04, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 4).astype(np.float32)
    X = sp.csr_matrix(X)
    topics = np.random.RandomState(0).rand(4, 500).astype(np.float32)
    topics /= topics.sum(1, keepdims=True)

    shapes = set()
    outs = []
    for lo, hi in ((0, 1100), (100, 1210), (200, 1290)):
        B = X[lo:hi]
        prep = sell_ops.prepare_sell(B, standardize=False)
        zd0 = np.random.RandomState(1).rand(B.shape[0], 4).astype(np.float32)
        zd0 /= zd0.sum(1, keepdims=True)
        zd_a, w_a, n_pad = sell_ops._bucket_doc_inputs(prep, "scatter", zd0, None)
        shapes.add((zd_a.shape, w_a.shape,
                    sell_ops._dev_struct(prep.dev)))
        out = sell_ops.sell_refit(prep, zd0, topics, n_iter=5, tolerance=0.0)
        assert np.asarray(out[0]).shape == (B.shape[0], 4)
        outs.append(np.asarray(out[0]))
    assert len(shapes) == 1, {s[:2] for s in shapes}
    # padded execution is exact: doc 200..1290 refit equals the COO refit
    Xc = X[200:1290].tocoo()
    zd0 = np.random.RandomState(1).rand(1090, 4).astype(np.float32)
    zd0 /= zd0.sum(1, keepdims=True)
    cur = zd0
    for _ in range(5):
        resp = coo_ops.e_step_coo(
            jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
            jnp.asarray(cur), jnp.asarray(topics))
        cur, _ = coo_ops.m_step_coo(
            jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
            resp, 1090, 500)
        cur = np.asarray(cur)
    np.testing.assert_allclose(outs[2], cur, rtol=3e-4, atol=1e-6)


def test_ensemble_sparse_backend():
    """EnsembleTopics(backend='sparse') runs the bootstrap fan-out on the
    O(nnz) resident layout; PreparedSell input is accepted; results agree with
    the dense backend on topic structure."""
    from enstop_tpu import EnsembleTopics
    from enstop_tpu.ops.sell import prepare_sell

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=83,
                                  n_docs=90, n_words=120).astype(np.int64))
    m = EnsembleTopics(n_components=4, n_starts=4, backend="sparse",
                       random_state=0).fit(X)
    md = EnsembleTopics(n_components=4, n_starts=4, random_state=0).fit(X)
    # the backends use different (device-side) init random streams, so the
    # discovered counts need not be identical — both must find valid structure
    assert 1 <= m.n_components_ <= 8 and 1 <= md.n_components_ <= 8
    np.testing.assert_allclose(m.components_.sum(1), 1.0, rtol=1e-4)
    assert m.embedding_.shape == (90, m.n_components_)
    assert np.isfinite(m.components_).all()

    prep = prepare_sell(X, standardize=False)
    m2 = EnsembleTopics(n_components=4, n_starts=4, random_state=0).fit(prep)
    assert m2.training_data_ is None
    assert m2.embedding_.shape == (90, m2.n_components_)


@pytest.mark.parametrize("seed", [501, 602, 703])
def test_sparse_step_fuzz_shapes(seed):
    """Oracle parity of the SELL step across randomized shapes, densities,
    topic counts, weights, and thresholds (the sparse analog of the dense
    fuzz sweep in test_em_parity)."""
    import oracle

    r = np.random.RandomState(seed)
    n = int(r.randint(15, 120))
    m = int(r.randint(40, 300))
    k = int(r.randint(2, 11))
    density = float(r.uniform(0.02, 0.25))
    X = sp.random(n, m, density=density, random_state=r, format="csr")
    X.data = np.ceil(X.data * 6).astype(np.float32)
    for i in np.flatnonzero(np.diff(X.indptr) == 0):
        X[i, r.randint(m)] = 1.0
    X = sp.csr_matrix(X)
    w = r.uniform(0.1, 3.0, n).astype(np.float32) if seed % 2 else None
    thresh = float(r.choice([1e-32, 1e-16, 1e-4]))

    zd = r.rand(n, k).astype(np.float32); zd /= zd.sum(1, keepdims=True)
    wz = r.rand(k, m).astype(np.float32); wz /= wz.sum(1, keepdims=True)

    Xd = X.toarray()
    rows, cols, vals = oracle.to_coo(Xd)
    resp = oracle.e_step(rows, cols, vals, wz, zd, thresh=thresh)
    want_zd, want_wz = oracle.m_step(rows, cols, vals, resp, n, m, sample_weight=w)

    sides = sell_ops.pack_sell(X)
    dev = sell_ops.device_arrays(sides)
    got_zd, got_wz, ll = sell_ops.em_step_sell(
        dev, jnp.asarray(zd), jnp.asarray(wz),
        w=None if w is None else jnp.asarray(w),
        thresh=None if thresh <= 1e-30 else thresh,
    )
    np.testing.assert_allclose(np.asarray(got_zd), want_zd, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), want_wz, rtol=5e-4, atol=1e-6)
    want_ll = oracle.log_likelihood(rows, cols, vals, wz, zd, sample_weight=w)
    assert float(ll) == pytest.approx(want_ll, rel=1e-4)


def test_all_execution_strategies_converge_identically():
    """Dense, sparse-resident, streamed, dense-mesh, and sparse-mesh all reach
    the same optimum from the same init — the framework-wide cross-variant
    equivalence the reference guarantees by construction (SURVEY §4c)."""
    from enstop_tpu.models.streamed_core import streamed_fit_core
    from enstop_tpu.parallel.sparse_mesh import make_docs_mesh, sparse_mesh_fit
    from enstop_tpu.parallel import mesh as mesh_lib
    from enstop_tpu.ops.init import plsa_init
    from enstop_tpu.ops.data import pad_factors, pad_vector
    import jax

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=97,
                                  n_docs=96, n_words=128))
    k, n_iter = 4, 20
    init = plsa_init(X, k, rng=np.random.RandomState(5))

    lls = {}
    _, _, info = plsa_fit(X, k, backend="xla", init=init, n_iter=n_iter,
                          n_iter_per_test=19, tolerance=0.0, random_state=0,
                          return_info=True)
    lls["dense"] = info["log_likelihood"]
    _, _, info = plsa_fit(X, k, backend="sparse", init=init, n_iter=n_iter,
                          n_iter_per_test=19, tolerance=0.0, random_state=0,
                          return_info=True)
    lls["sparse"] = info["log_likelihood"]
    _, _, _, trace = streamed_fit_core(X, k, init=init, block_docs=32,
                                       n_iter=n_iter, n_iter_per_test=19,
                                       tolerance=0.0, random_state=0)
    lls["streamed"] = trace[-1]
    _, _, _, trace = sparse_mesh_fit(X, k, mesh=make_docs_mesh(4), init=init,
                                     n_iter=n_iter, n_iter_per_test=19,
                                     tolerance=0.0, random_state=0)
    lls["sparse_mesh"] = trace[-1]

    base = lls["dense"]
    for name, v in lls.items():
        assert v == pytest.approx(base, rel=2e-4), (name, lls)


def test_ensemble_sparse_backend_deterministic():
    """Device-PRNG inits are keyed from random_state: same seed, same model."""
    from enstop_tpu import EnsembleTopics

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=84,
                                  n_docs=70, n_words=100).astype(np.int64))
    a = EnsembleTopics(n_components=3, n_starts=3, backend="sparse",
                       random_state=7).fit(X)
    b = EnsembleTopics(n_components=3, n_starts=3, backend="sparse",
                       random_state=7).fit(X)
    assert a.n_components_ == b.n_components_
    np.testing.assert_array_equal(a.components_, b.components_)


def test_sell_compile_failure_falls_back_to_chunks(rng, monkeypatch):
    """backend='sparse' must never hard-fail when the SELL program is
    rejected by the compiler (observed at 19M-nnz scale): the prepared
    corpus repacks to the Pallas chunk layout in place and the fit retries
    (VERDICT r2 item 8)."""
    import warnings

    import enstop_tpu.ops.sell as sell_mod
    from enstop_tpu.ops.init import plsa_init

    X = sp.csr_matrix(make_corpus(rng, n_docs=40, n_words=50, seed=3))
    prep = sell_mod.prepare_sell(X, standardize=False)
    assert prep.kind == "sell" and prep.src is not None
    pzd0, pwz0 = plsa_init(X, 3, rng=np.random.RandomState(0))

    real_build = sell_mod._build_sell_fit.__wrapped__

    def failing_build(refit, thresholded, segsum, dev_struct, kind="sell",
                      thresh_value=None, meta=None):
        if kind == "sell":
            raise RuntimeError("simulated remote-compile rejection (HTTP 500)")
        return real_build(refit, thresholded, segsum, dev_struct, kind=kind,
                          thresh_value=thresh_value, meta=meta)

    monkeypatch.setattr(sell_mod, "_build_sell_fit", failing_build)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        zd, wz, steps, ll, trace, n_tests = sell_mod.sell_fit(
            prep, pzd0, pwz0, n_iter=8, n_iter_per_test=5)
    assert prep.kind == "chunks"          # mutated in place: no re-failing
    assert any("chunk" in str(w.message) for w in caught)
    assert np.isfinite(float(ll))

    # parity with the ordinary chunk path on the same init
    prep_c = sell_mod.prepare_sell(X, standardize=False, kind="chunks")
    zd2, wz2, steps2, ll2, _, _ = sell_mod.sell_fit(
        prep_c, pzd0, pwz0, n_iter=8, n_iter_per_test=5)
    assert int(steps) == int(steps2)
    np.testing.assert_allclose(np.asarray(wz), np.asarray(wz2),
                               rtol=1e-4, atol=1e-6)

    # the refit path falls back too (fresh prep, still-failing SELL build)
    prep3 = sell_mod.prepare_sell(X, standardize=False)
    emb = sell_mod.sell_refit(prep3, np.asarray(zd)[:, :3], np.asarray(wz),
                              n_iter=4)[0]
    assert prep3.kind == "chunks"
    assert np.isfinite(np.asarray(emb)).all()


def test_sell_user_errors_do_not_trigger_fallback(rng, monkeypatch):
    """Trace-time user errors (TypeError/ValueError) must surface unchanged —
    only RuntimeError (XlaRuntimeError's base: compile/runtime failures)
    triggers the expensive chunk repack."""
    import pytest

    import enstop_tpu.ops.sell as sell_mod
    from enstop_tpu.ops.init import plsa_init

    X = sp.csr_matrix(make_corpus(rng, n_docs=30, n_words=40, seed=8))
    prep = sell_mod.prepare_sell(X, standardize=False)
    pzd0, pwz0 = plsa_init(X, 3, rng=np.random.RandomState(0))

    def type_error_build(*a, **kw):
        raise TypeError("bad shapes from the user")

    monkeypatch.setattr(sell_mod, "_build_sell_fit", type_error_build)
    with pytest.raises(TypeError):
        sell_mod.sell_fit(prep, pzd0, pwz0, n_iter=4)
    assert prep.kind == "sell"  # untouched: no repack happened


def test_sell_execution_phase_errors_do_not_trigger_fallback(rng):
    """Execution-phase failures must NOT repack (ADVICE r03): a transient
    relay death mid-run raises XlaRuntimeError (a RuntimeError subclass),
    and repacking a 19M-nnz corpus to retry on an equally-dead device would
    cost minutes and mask the real failure.  Two gates: a program that has
    already executed cannot hit a compile rejection (first_use=False), and
    result-readback failure messages are recognized."""
    import enstop_tpu.ops.sell as sell_mod
    from enstop_tpu.ops.init import plsa_init

    X = sp.csr_matrix(make_corpus(rng, n_docs=30, n_words=40, seed=11))
    prep = sell_mod.prepare_sell(X, standardize=False)
    pzd0, pwz0 = plsa_init(X, 3, rng=np.random.RandomState(0))

    # gate 1: after a successful fit the program is marked as having run,
    # so a later RuntimeError is classified execution-phase -> no repack
    sell_mod.sell_fit(prep, pzd0, pwz0, n_iter=4)
    run = sell_mod._build_sell_fit(
        False, False, "scatter", sell_mod._dev_struct(prep.dev),
        kind=prep.kind, thresh_value=None, meta=prep.meta)
    assert getattr(run, "_ran_ok", False) is True
    assert not sell_mod._fallback_to_chunks(
        prep, RuntimeError("socket closed"), first_use=False)
    assert prep.kind == "sell"  # untouched

    # gate 2: readback failures are execution-phase even on first use
    assert not sell_mod._fallback_to_chunks(
        prep,
        RuntimeError("NOT_FOUND: Buffer Definition Event: Function "
                     "fusion.6 not found"),
        first_use=True)
    assert prep.kind == "sell"

    # sanity: a genuine first-use compile rejection still falls back
    assert sell_mod._fallback_to_chunks(
        prep, RuntimeError("remote compile failed (HTTP 500)"),
        first_use=True)
    assert prep.kind == "chunks"


def test_sell_src_stays_pinned_after_successful_fit(rng):
    """The host corpus pin must SURVIVE a successful fit: a later call on
    the same prepared corpus with a different k / threshold / refit is a
    separate compile that can still be rejected and need the chunks
    fallback (the pin is a reference to the caller's matrix, not a copy,
    so keeping it costs nothing)."""
    import enstop_tpu.ops.sell as sell_mod
    from enstop_tpu.ops.init import plsa_init

    X = sp.csr_matrix(make_corpus(rng, n_docs=30, n_words=40, seed=9))
    prep = sell_mod.prepare_sell(X, standardize=False)
    assert prep.src is not None
    pzd0, pwz0 = plsa_init(X, 3, rng=np.random.RandomState(0))
    sell_mod.sell_fit(prep, pzd0, pwz0, n_iter=4)
    assert prep.src is not None  # still available to _fallback_to_chunks
