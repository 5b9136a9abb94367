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


def test_fallback_paths(rng, monkeypatch):
    monkeypatch.setattr(native, "get_lib", lambda: None)
    X = _csr(rng)
    out = np.zeros((200, 384), np.float32)
    native.densify_csr_rows(X, 0, 200, out)
    want = np.zeros_like(out)
    want[:, :300] = X.toarray()
    np.testing.assert_allclose(out, want, rtol=1e-6)
