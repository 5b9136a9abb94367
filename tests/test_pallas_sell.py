"""Parity of the Pallas chunk kernels (ops/pallas_sell.py) vs the exact COO
path — interpret mode on CPU; the real-TPU runs happen in scripts/bench_sparse.py."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from conftest import make_corpus
from enstop_tpu.ops import coo as coo_ops
from enstop_tpu.ops import pallas_sell as ps


def _setup(seed=0, n=90, m=140, k=5, density=0.08, weighted=False):
    rng = np.random.RandomState(seed)
    X = sp.random(n, m, density=density, random_state=rng, format="csr")
    X.data = np.ceil(X.data * 5).astype(np.float32)
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


def test_pack_chunks_roundtrip():
    X, _, _, _ = _setup(seed=1)
    ch = ps.pack_chunks(X, bd=32, bw=64, chunk=128)
    assert ch.nnz == X.nnz
    for side, major in ((ch.word_major, "j"), (ch.doc_major, "i")):
        recon = np.zeros(X.shape, np.float32)
        for c in range(side.n_chunks):
            gi, gj = side.chunk_i[c], side.chunk_j[c]
            for sl in range(ch.chunk):
                v = side.vals[c, sl]
                if v != 0:
                    recon[gi * 32 + side.rows_local[c, sl],
                          gj * 64 + side.cols_local[c, sl]] += v
        np.testing.assert_array_equal(recon, X.toarray())
        # major axis non-decreasing and every major block covered
        arr = side.chunk_j if major == "j" else side.chunk_i
        assert np.all(np.diff(arr) >= 0)
        n_major = (ch.m_pad // 64) if major == "j" else (ch.n_pad // 32)
        assert set(arr.tolist()) == set(range(n_major))


@pytest.mark.parametrize("weighted", [False, True])
@pytest.mark.parametrize("bd,bw,chunk", [(32, 64, 128), (64, 32, 256)])
def test_chunk_step_matches_coo(weighted, bd, bw, chunk):
    X, zd, wz, w = _setup(seed=3, weighted=weighted)
    ch = ps.pack_chunks(X, bd=bd, bw=bw, chunk=chunk)
    dev = ps.device_chunks(ch)
    zd2, wz2, ll2 = ps.em_step_chunks(
        dev, jnp.asarray(zd), jnp.asarray(wz),
        w=None if w is None else jnp.asarray(w),
        bd=bd, bw=bw, n_pad=ch.n_pad, m_pad=ch.m_pad,
    )
    zd1, wz1, ll1 = _coo_step(X, zd, wz, w, 1e-32)
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(zd1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(wz2), np.asarray(wz1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-5)


@pytest.mark.parametrize("thresh", [1e-16, 1e-3])
def test_chunk_step_threshold_matches_coo(thresh):
    X, zd, wz, w = _setup(seed=7, weighted=True)
    ch = ps.pack_chunks(X, bd=32, bw=64, chunk=128)
    dev = ps.device_chunks(ch)
    zd2, wz2, ll2 = ps.em_step_chunks(
        dev, jnp.asarray(zd), jnp.asarray(wz), w=jnp.asarray(w), thresh=thresh,
        bd=32, bw=64, n_pad=ch.n_pad, m_pad=ch.m_pad,
    )
    zd1, wz1, ll1 = _coo_step(X, zd, wz, w, thresh)
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(zd1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(wz2), np.asarray(wz1), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-5)


def test_chunk_refit_matches_coo():
    X, zd, wz, _ = _setup(seed=11)
    ch = ps.pack_chunks(X, bd=32, bw=64, chunk=128)
    dev = ps.device_chunks(ch)
    zd2, _ = ps.refit_step_chunks(dev, jnp.asarray(zd), jnp.asarray(wz),
                                  bd=32, bw=64, n_pad=ch.n_pad, m_pad=ch.m_pad)
    Xc = X.tocoo()
    resp = coo_ops.e_step_coo(jnp.asarray(Xc.row), jnp.asarray(Xc.col),
                              jnp.asarray(Xc.data), jnp.asarray(zd), jnp.asarray(wz))
    pzd, _ = coo_ops.m_step_coo(jnp.asarray(Xc.row), jnp.asarray(Xc.col),
                                jnp.asarray(Xc.data), resp, X.shape[0], X.shape[1])
    np.testing.assert_allclose(np.asarray(zd2), np.asarray(pzd), rtol=2e-5, atol=1e-7)


def test_chunk_ll_matches_coo():
    X, zd, wz, w = _setup(seed=13, weighted=True)
    ch = ps.pack_chunks(X, bd=32, bw=64, chunk=128)
    dev = ps.device_chunks(ch)
    ll2 = ps.log_likelihood_chunks(dev, jnp.asarray(zd), jnp.asarray(wz),
                                   w=jnp.asarray(w), bd=32, bw=64,
                                   n_pad=ch.n_pad, m_pad=ch.m_pad)
    Xc = X.tocoo()
    ll1 = coo_ops.log_likelihood_coo(
        jnp.asarray(Xc.row), jnp.asarray(Xc.col), jnp.asarray(Xc.data),
        jnp.asarray(zd), jnp.asarray(wz), jnp.asarray(w))
    np.testing.assert_allclose(float(ll2), float(ll1), rtol=1e-5)


def test_chunk_multi_step_trajectory():
    """Several consecutive steps track the COO path (accumulation residency
    across chunk runs is exercised repeatedly)."""
    X, zd, wz, _ = _setup(seed=17, n=70, m=90, density=0.12)
    ch = ps.pack_chunks(X, bd=32, bw=32, chunk=128)
    dev = ps.device_chunks(ch)
    zd_j, wz_j = jnp.asarray(zd), jnp.asarray(wz)
    zd_c, wz_c = zd, wz
    for step in range(4):
        zd_j, wz_j, _ = ps.em_step_chunks(dev, zd_j, wz_j, bd=32, bw=32,
                                          n_pad=ch.n_pad, m_pad=ch.m_pad)
        zd_c, wz_c, _ = _coo_step(X, np.asarray(zd_c), np.asarray(wz_c), None, 1e-32)
        np.testing.assert_allclose(np.asarray(zd_j), np.asarray(zd_c),
                                   rtol=5e-4, atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(np.asarray(wz_j), np.asarray(wz_c),
                                   rtol=5e-4, atol=1e-6, err_msg=f"step {step}")


def test_auto_tile_shape():
    """Default 512 tiles at bench scale; growth to the measured-best shapes on
    huge corpora whose grid would blow the SMEM scalar-prefetch ceiling."""
    from enstop_tpu.ops.pallas_sell import auto_tile_shape

    assert auto_tile_shape(18846, 25000, 2_711_701) == (512, 512)
    assert auto_tile_shape(250_000, 141_000, 18_888_726) == (2048, 2048)
    bd, bw = auto_tile_shape(8_000_000, 141_000, 500_000_000)
    assert max(bd, bw) <= 4096 and bd >= 2048
