"""Seeded cross-backend fuzz: every EM-step execution path must agree with
the exact COO form on randomized shapes, densities, weights, and thresholds.

The COO path is the pinned reference-semantics ground truth (itself
oracle-tested).  This sweep exists to catch edge-shape bugs the handcrafted
parity tests miss — the interpret-mode aliasing corruption (fixed in round
3) was exactly this class: correct at the suite's usual shapes, silently
wrong at n_pad > bd.  All randomness is seeded; the sweep is deterministic.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from enstop_tpu.ops import coo as coo_ops
from enstop_tpu.ops import em as em_ops
from enstop_tpu.ops import pallas_em
from enstop_tpu.ops import sell as sell_ops
from enstop_tpu.ops.data import pad_dense_counts, pad_factors, pad_vector


def _random_config(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(5, 120))
    m = int(rng.randint(8, 300))
    k = int(rng.randint(2, 9))
    density = float(rng.uniform(0.02, 0.3))
    weighted = bool(rng.randint(2))
    thresh = float(rng.choice([1e-32, 1e-3]))
    X = sp.random(n, m, density=density, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 6).astype(np.float32)
    # kernels assume no all-zero docs (estimators strip them first)
    for i in np.flatnonzero(np.diff(X.indptr) == 0):
        X[i, rng.randint(m)] = 1.0
    X = sp.csr_matrix(X)
    zd = rng.rand(n, k).astype(np.float32)
    zd /= zd.sum(1, keepdims=True)
    wz = rng.rand(k, m).astype(np.float32) + 1e-3
    wz /= wz.sum(1, keepdims=True)
    w = (rng.rand(n).astype(np.float32) * 2 + 0.1) if weighted else None
    return X, zd, wz, w, thresh


def _coo_truth(X, zd, wz, w, thresh):
    Xc = X.tocoo()
    return coo_ops.em_step_coo(
        jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
        jnp.asarray(zd), jnp.asarray(wz), X.shape[0], X.shape[1],
        sample_weight=None if w is None else jnp.asarray(w),
        probability_threshold=thresh,
    )


def _agree(got, want, n, m, k):
    zd_g, wz_g, ll_g = got
    zd_w, wz_w, ll_w = want
    np.testing.assert_allclose(
        np.asarray(zd_g)[:n, :k], np.asarray(zd_w)[:n, :k],
        rtol=3e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(wz_g)[:k, :m], np.asarray(wz_w)[:k, :m],
        rtol=3e-4, atol=1e-6,
    )
    np.testing.assert_allclose(float(ll_g), float(ll_w), rtol=1e-4)


@pytest.mark.parametrize("seed", range(8))
def test_sell_step_fuzz(seed):
    X, zd, wz, w, thresh = _random_config(seed)
    want = _coo_truth(X, zd, wz, w, thresh)
    dev = sell_ops.device_arrays(sell_ops.pack_sell(X))
    got = sell_ops.em_step_sell(
        dev, jnp.asarray(zd), jnp.asarray(wz),
        w=None if w is None else jnp.asarray(w),
        thresh=thresh if thresh > sell_ops.THRESH_MATERIAL else None,
    )
    _agree(got, want, X.shape[0], X.shape[1], zd.shape[1])


@pytest.mark.parametrize("seed", range(8))
def test_dense_backends_fuzz(seed):
    """XLA dense and fused-Pallas paths on the padded rectangle (inert
    threshold only — the dense fast paths document thresh<=1e-30 as a
    numerical no-op and the exact masked form lives in COO/SELL)."""
    X, zd, wz, w, _ = _random_config(seed)
    n, m = X.shape
    k = zd.shape[1]
    want = _coo_truth(X, zd, wz, w, 1e-32)

    # deliberately small tiles so the grid has MANY blocks on both axes
    bd, bw = 16, 128
    Xp, _, _ = pad_dense_counts(X, row_multiple=bd, col_multiple=bw)
    n_pad, m_pad = Xp.shape
    zd_p, wz_p = pad_factors(zd, wz, n_pad, m_pad)
    w_p = None if w is None else jnp.asarray(pad_vector(w, n_pad))

    got_xla = em_ops.em_step_dense(
        jnp.asarray(Xp), jnp.asarray(zd_p), jnp.asarray(wz_p), sample_weight=w_p
    )
    _agree(got_xla, want, n, m, k)

    got_pallas = pallas_em.em_step_fused(
        jnp.asarray(Xp), jnp.asarray(zd_p), jnp.asarray(wz_p),
        sample_weight=w_p, bd=bd, bw=bw,
    )
    _agree(got_pallas, want, n, m, k)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("backend", ["xla", "pallas", "sparse"])
def test_full_fit_trajectory_fuzz(seed, backend):
    """End-to-end driver fits on random configs must follow the oracle's
    exact convergence schedule (same early-stop step count, same tested
    log-likelihoods) regardless of backend."""
    import oracle
    from enstop_tpu.ops.driver import plsa_fit
    from enstop_tpu.ops.init import plsa_init

    X, _, _, w, _ = _random_config(seed + 200)
    k = 4
    pzd, pwz = plsa_init(X, k, rng=np.random.RandomState(seed))
    Xc = X.tocoo()
    n_iter, npt, tol = 25, 5, 0.01
    want_zd, want_wz, want_steps, want_lls = oracle.fit(
        Xc.row, Xc.col, Xc.data.astype(np.float64), pzd, pwz, *X.shape,
        n_iter=n_iter, n_iter_per_test=npt, tolerance=tol,
        sample_weight=w,
    )
    zd, wz, info = plsa_fit(
        X, k, sample_weight=w, init=(pzd, pwz), n_iter=n_iter,
        n_iter_per_test=npt, tolerance=tol, backend=backend,
        x_dtype=np.float32, return_info=True,
    )
    assert info["n_steps"] == want_steps, (backend, seed)
    np.testing.assert_allclose(
        info["ll_trace"], np.array(want_lls), rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(zd), want_zd, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wz), want_wz, rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_sparse_mesh_thresh_trajectory_fuzz(seed):
    """The docs-mesh thresholded fit must follow the single-chip sparse
    backend's trajectory on random configs and random shard counts — the
    multi-device analogue of the single-chip trajectory fuzz.  (The oracle is
    not the comparator here: at aggressive thresholds the reference's
    unguarded log produces -inf when a word column is fully masked —
    plsa.py:384 — while every shipped path clamps at the documented 1e-30
    denormal guard; the two sparse implementations must agree with each
    other exactly.)"""
    from enstop_tpu.ops.driver import plsa_fit
    from enstop_tpu.ops.init import plsa_init
    from enstop_tpu.parallel.sparse_mesh import make_docs_mesh, sparse_mesh_fit

    rng = np.random.RandomState(seed)
    X, _, _, w, _ = _random_config(seed + 300)
    k = 3
    thresh = float(rng.choice([1e-3, 1e-2]))
    n_shards = int(rng.choice([2, 4, 8]))
    pzd, pwz = plsa_init(X, k, rng=np.random.RandomState(seed))
    n_iter, npt, tol = 15, 5, 0.01
    want_zd, want_wz, info = plsa_fit(
        X, k, sample_weight=w, init=(pzd, pwz), n_iter=n_iter,
        n_iter_per_test=npt, tolerance=tol, e_step_thresh=thresh,
        backend="sparse", x_dtype=np.float32, return_info=True,
    )
    zd, wz, steps, trace = sparse_mesh_fit(
        X, k, mesh=make_docs_mesh(n_shards), sample_weight=w,
        init=(pzd, pwz), n_iter=n_iter, n_iter_per_test=npt, tolerance=tol,
        e_step_thresh=thresh, random_state=seed,
    )
    assert steps == info["n_steps"], (seed, n_shards, thresh)
    np.testing.assert_allclose(trace, info["ll_trace"], rtol=1e-4)
    np.testing.assert_allclose(zd, np.asarray(want_zd), rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(wz, np.asarray(want_wz), rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_streamed_thresh_trajectory_fuzz(seed):
    """The out-of-core streamed fit with a material threshold must follow the
    resident sparse backend's trajectory on random configs and block sizes."""
    from enstop_tpu.models.streamed_core import streamed_fit_core
    from enstop_tpu.ops.driver import plsa_fit
    from enstop_tpu.ops.init import plsa_init

    rng = np.random.RandomState(seed)
    X, _, _, w, _ = _random_config(seed + 400)
    k = 3
    thresh = float(rng.choice([1e-3, 1e-2]))
    block_docs = int(rng.choice([8, 16, 32]))
    pzd, pwz = plsa_init(X, k, rng=np.random.RandomState(seed))
    n_iter, npt, tol = 15, 5, 0.01
    want_zd, want_wz, info = plsa_fit(
        X, k, sample_weight=w, init=(pzd, pwz), n_iter=n_iter,
        n_iter_per_test=npt, tolerance=tol, e_step_thresh=thresh,
        backend="sparse", x_dtype=np.float32, return_info=True,
    )
    zd, wz, steps, trace = streamed_fit_core(
        X, k, block_docs=block_docs, sample_weight=w, init=(pzd, pwz),
        n_iter=n_iter, n_iter_per_test=npt, tolerance=tol,
        e_step_thresh=thresh, random_state=seed,
    )
    assert steps == info["n_steps"], (seed, block_docs, thresh)
    np.testing.assert_allclose(trace, info["ll_trace"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(zd), np.asarray(want_zd),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wz), np.asarray(want_wz),
                               rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("seed", range(4))
def test_refit_step_fuzz(seed):
    X, zd, wz, w, _ = _random_config(seed + 100)
    n, m = X.shape
    k = zd.shape[1]
    Xc = X.tocoo()
    resp = coo_ops.e_step_coo(
        jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
        jnp.asarray(zd), jnp.asarray(wz),
    )
    want_zd, _ = coo_ops.m_step_coo(
        jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
        resp, n, m,
    )

    bd, bw = 16, 128
    Xp, _, _ = pad_dense_counts(X, row_multiple=bd, col_multiple=bw)
    zd_p, wz_p = pad_factors(zd, wz, *Xp.shape)
    got_zd, _ = pallas_em.refit_step_fused(
        jnp.asarray(Xp), jnp.asarray(zd_p), jnp.asarray(wz_p), bd=bd, bw=bw
    )
    np.testing.assert_allclose(
        np.asarray(got_zd)[:n, :k], np.asarray(want_zd)[:n, :k],
        rtol=3e-4, atol=1e-6,
    )
