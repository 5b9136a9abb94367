"""Native packer: correctness vs numpy, fallback path."""

import numpy as np
import scipy.sparse as sp

from enstop_tpu import native


def _csr(rng, n=200, m=300, density=0.05):
    return sp.random(n, m, density=density, format="csr", dtype=np.float32,
                     random_state=rng)


def test_densify_rows_matches_numpy(rng):
    X = _csr(rng)
    out = np.zeros((128, 384), np.float32)
    native.densify_csr_rows(X, 30, 158, out)
    want = np.zeros_like(out)
    want[:, :300] = X[30:158].toarray()
    np.testing.assert_array_equal(out, want)


def test_gather_matches_numpy(rng):
    X = _csr(rng)
    ids = rng.randint(0, 200, 64).astype(np.int64)
    out = np.zeros((64, 384), np.float32)
    native.densify_csr_gather(X, ids, out)
    want = np.zeros_like(out)
    want[:, :300] = X[ids].toarray()
    np.testing.assert_array_equal(out, want)


def test_sell_pack_native_matches_numpy(rng, monkeypatch):
    """Both native SELL packers (per-side + fused CSR->word-major transpose)
    must reproduce the numpy scatter bit-for-bit, incl. empty rows/cols."""
    from enstop_tpu.ops import sell as sell_ops

    n, m, nnz = 500, 310, 6000
    rows = rng.randint(0, n - 25, nnz).astype(np.int32)  # trailing rows empty
    cols = ((m - 30) * (rng.random_sample(nnz) ** 2)).astype(np.int32)
    vals = rng.randint(1, 6, nnz).astype(np.float32)
    X = sp.coo_matrix((vals, (rows, cols)), shape=(n, m)).tocsr()
    X.sum_duplicates()

    for build_tables in (False, True):
        got = sell_ops.pack_sell(X, build_tables=build_tables)
        monkeypatch.setattr(native, "sell_pack_side", lambda *a, **k: False)
        monkeypatch.setattr(native, "sell_pack_word_side_from_csr",
                            lambda *a, **k: False)
        want = sell_ops.pack_sell(X, build_tables=build_tables)
        monkeypatch.undo()
        for attr in ("row_doc", "cols_a", "vals_a", "col_word", "rows_b",
                     "vals_b"):
            np.testing.assert_array_equal(
                getattr(got, attr), getattr(want, attr), err_msg=attr
            )
        if build_tables:
            np.testing.assert_array_equal(got.doc_segs, want.doc_segs)
            np.testing.assert_array_equal(got.word_segs, want.word_segs)


def test_fallback_paths(rng, monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)
    X = _csr(rng)
    out = np.zeros((200, 384), np.float32)
    native.densify_csr_rows(X, 0, 200, out)
    want = np.zeros_like(out)
    want[:, :300] = X.toarray()
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_chunk_pack_native_matches_numpy(rng, monkeypatch):
    """The fully-native two-pass chunk packer (C histogram + C fill) must be
    bit-identical to the numpy pipeline, incl. coverage dummies and Zipf skew."""
    from enstop_tpu.ops import pallas_sell as ps

    n, m, nnz = 900, 800, 4000
    r = rng.randint(0, 50, nnz)  # most row tiles empty
    c = ((m - 200) * (rng.random_sample(nnz) ** 4)).astype(np.int32)
    v = rng.randint(1, 5, nnz).astype(np.float32)
    X = sp.coo_matrix((v, (r, c)), shape=(n, m)).tocsr()
    X.sum_duplicates()

    for bd, bw in ((128, 256), (256, 128)):
        got = ps.pack_chunks(X, bd=bd, bw=bw)
        monkeypatch.setattr(native, "chunk_histogram", lambda *a, **k: None)
        want = ps.pack_chunks(X, bd=bd, bw=bw)
        monkeypatch.undo()
        for side in ("word_major", "doc_major"):
            sa, sb = getattr(got, side), getattr(want, side)
            assert sa.n_chunks == sb.n_chunks
            for f in ("rows_local", "cols_local", "vals", "chunk_i",
                      "chunk_j", "first_of_major"):
                np.testing.assert_array_equal(
                    getattr(sa, f), getattr(sb, f), err_msg=f"{side}.{f}"
                )
