"""Device-densify staging: the O(nnz) COO ship + on-device scatter must
reproduce the host densify + dense-H2D path exactly (every dtype mode), and
the auto heuristic must pick the sparse ship only when it pays."""

import numpy as np
import scipy.sparse as sp

from enstop_tpu.ops.driver import (
    _device_densify_worthwhile,
    prepare_counts,
)


def _corpus(rng, n=300, m=450, nnz=5000, vmax=4):
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, m, nnz)
    v = rng.randint(1, vmax, nnz).astype(np.int64)
    return sp.coo_matrix((v, (r, c)), shape=(n, m))


def test_device_stage_matches_host_bf16_and_f32(rng):
    X = _corpus(rng)  # COO with duplicate entries exercises sum_duplicates
    for x_dtype in ("auto", np.float32):
        a = prepare_counts(X, stage="device", x_dtype=x_dtype, standardize=False)
        b = prepare_counts(X, stage="host", x_dtype=x_dtype, standardize=False)
        A, B = np.asarray(a.device_array), np.asarray(b.device_array)
        assert A.dtype == B.dtype and A.shape == B.shape
        np.testing.assert_array_equal(A.astype(np.float32), B.astype(np.float32))


def test_device_stage_matches_host_standardized(rng):
    X = _corpus(rng).tocsr().astype(np.float64)
    a = prepare_counts(X, stage="device", standardize=True)
    b = prepare_counts(X, stage="host", standardize=True)
    np.testing.assert_allclose(
        np.asarray(a.device_array), np.asarray(b.device_array), rtol=1e-6
    )


def test_device_stage_large_counts_force_f32(rng):
    X = _corpus(rng, vmax=2000)  # counts > 256: bf16 would be lossy
    a = prepare_counts(X, stage="device", standardize=False)
    assert np.asarray(a.device_array).dtype == np.float32
    b = prepare_counts(X, stage="host", standardize=False)
    np.testing.assert_array_equal(
        np.asarray(a.device_array), np.asarray(b.device_array)
    )


def test_worthwhile_heuristic():
    # tiny corpus: dense bytes are small, COO ship + scatter not worth it
    X_small = sp.random(100, 100, density=0.05, format="csr")
    assert not _device_densify_worthwhile(X_small, 104, 128, np.float32)
    # 20NG-scale sparse corpus: dense rectangle dwarfs the nonzero bytes
    X_big = sp.csr_matrix((18_846, 25_000))
    assert _device_densify_worthwhile(X_big, 18_944, 25_600, "bfloat16")


def test_fit_through_device_stage_matches_host(rng):
    """Full fit parity: identical factors from both staging paths."""
    from enstop_tpu.ops.driver import plsa_fit

    X = _corpus(rng, n=120, m=160, nnz=1500).tocsr()
    pa = prepare_counts(X, stage="device", standardize=False)
    pb = prepare_counts(X, stage="host", standardize=False)
    za, wa = plsa_fit(pa, 4, n_iter=15, random_state=7)
    zb, wb = plsa_fit(pb, 4, n_iter=15, random_state=7)
    np.testing.assert_allclose(za, zb, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(wa, wb, rtol=1e-6, atol=1e-8)


def test_device_stage_edge_shapes(rng):
    """Degenerate corpora through the scatter path: single row/col, all-zero
    rows, nnz exactly on the pad bucket boundary."""
    from enstop_tpu.ops.driver import _DENSIFY_NNZ_BUCKET

    cases = []
    # single doc
    cases.append(sp.csr_matrix(np.array([[0, 2, 0, 1]], np.int64)))
    # single word
    cases.append(sp.csr_matrix(np.array([[1], [0], [3]], np.int64)))
    # interior all-zero rows
    Xz = np.zeros((6, 5), np.int64)
    Xz[0, 1] = 2
    Xz[5, 4] = 1
    cases.append(sp.csr_matrix(Xz))
    for X in cases:
        a = prepare_counts(X, stage="device", standardize=False)
        b = prepare_counts(X, stage="host", standardize=False)
        np.testing.assert_array_equal(
            np.asarray(a.device_array).astype(np.float32),
            np.asarray(b.device_array).astype(np.float32),
        )

    # nnz lands exactly on the bucket boundary (no padding lanes at all)
    n, m = 300, 400
    nnz = _DENSIFY_NNZ_BUCKET
    r = rng.randint(0, n, nnz)
    c = rng.randint(0, m, nnz)
    X = sp.coo_matrix((np.ones(nnz, np.int64), (r, c)), shape=(n, m)).tocsr()
    X.sum_duplicates()
    a = prepare_counts(X, stage="device", standardize=False)
    b = prepare_counts(X, stage="host", standardize=False)
    np.testing.assert_array_equal(
        np.asarray(a.device_array).astype(np.float32),
        np.asarray(b.device_array).astype(np.float32),
    )


def test_stage_sharded_counts_empty_tiles(rng):
    """Mesh staging with entire empty tile rows/cols (devices owning no
    nonzeros must still produce their zero tiles)."""
    from enstop_tpu.parallel import mesh as mesh_lib
    from enstop_tpu.ops.data import pad_dense_counts

    mesh = mesh_lib.make_mesh(4, 2)
    # all nonzeros live in the top-left corner: most tiles are empty
    r = rng.randint(0, 20, 500)
    c = rng.randint(0, 30, 500)
    X = sp.coo_matrix((np.ones(500, np.float32), (r, c)), shape=(600, 700)).tocsr()
    X.sum_duplicates()
    Xs, n, m = mesh_lib.stage_sharded_counts(mesh, X)
    rm, cm = mesh_lib.mesh_layout_multiples(mesh, "xla")
    Xd, _, _ = pad_dense_counts(X, row_multiple=rm, col_multiple=cm)
    np.testing.assert_array_equal(np.asarray(Xs), Xd)
