"""L0 utility parity: normalize, standardize_input, sample-weight validation."""

import numpy as np
import pytest
import scipy.sparse as sp

from enstop_tpu.utils import _check_sample_weight, normalize, normalized, standardize_input


def test_normalize_rows_in_place(rng):
    a = rng.rand(5, 7)
    out = normalize(a, axis=1)
    assert out is a
    np.testing.assert_allclose(a.sum(axis=1), 1.0)


def test_normalize_columns_in_place(rng):
    a = rng.rand(5, 7)
    normalize(a, axis=0)
    np.testing.assert_allclose(a.sum(axis=0), 1.0)


def test_normalize_zero_slice_untouched():
    a = np.array([[1.0, 1.0], [0.0, 0.0]])
    normalize(a, axis=1)
    np.testing.assert_allclose(a, [[0.5, 0.5], [0.0, 0.0]])


def test_normalize_bad_axis():
    with pytest.raises(ValueError):
        normalize(np.ones((2, 2)), axis=2)


def test_normalized_pure(rng):
    a = rng.rand(4, 6)
    b = normalized(a, axis=1)
    assert not np.shares_memory(a, b)
    np.testing.assert_allclose(b.sum(axis=1), 1.0)


def test_standardize_input_float_normalizes(rng):
    X = sp.csr_matrix(rng.rand(4, 6).astype(np.float32))
    Y = standardize_input(X)
    np.testing.assert_allclose(np.asarray(Y.sum(axis=1)).ravel(), 1.0, rtol=1e-6)


def test_standardize_input_counts_pass_through(rng):
    X = sp.csr_matrix((rng.rand(4, 6) * 5).astype(np.int64))
    Y = standardize_input(X)
    assert Y is X


def test_check_sample_weight_defaults_and_errors():
    X = np.zeros((5, 3))
    w = _check_sample_weight(None, X, dtype=np.float32)
    np.testing.assert_array_equal(w, np.ones(5, np.float32))
    w = _check_sample_weight(2.5, X)
    np.testing.assert_array_equal(w, np.full(5, 2.5))
    with pytest.raises(ValueError):
        _check_sample_weight(np.ones((5, 2)), X)
    with pytest.raises(ValueError):
        _check_sample_weight(np.ones(4), X)


def test_pad_dense_counts_min_rows():
    """min_rows pads to a coarser row target (absorbing zeros) — the shape
    bucketing hook for serving staging (round 4)."""
    import numpy as np
    import scipy.sparse as sp

    from enstop_tpu.ops.data import pad_dense_counts

    X = sp.csr_matrix(np.arange(12, dtype=np.int64).reshape(3, 4))
    out, n, m = pad_dense_counts(X, row_multiple=8, col_multiple=128,
                                 min_rows=20)
    assert (n, m) == (3, 4)
    assert out.shape == (24, 128)  # max(3, 20) rounded to 8
    np.testing.assert_array_equal(out[:3, :4], X.toarray())
    assert not out[3:].any() and not out[:, 4:].any()
    # default keeps the old behavior exactly
    out2, _, _ = pad_dense_counts(X, row_multiple=8, col_multiple=128)
    assert out2.shape == (8, 128)
