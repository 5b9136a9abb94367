"""Mesh-sharded backend: parity with the single-device path on an 8-device CPU mesh."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import oracle
from enstop_tpu.ops.init import plsa_init
from enstop_tpu.parallel import mesh as mesh_lib
from enstop_tpu.ops.data import pad_dense_counts, pad_factors, pad_vector
from enstop_tpu.ops import em as em_ops


@pytest.fixture(params=[(8, 1), (4, 2), (2, 4), (1, 8)])
def mesh(request):
    rows, cols = request.param
    if len(jax.devices()) < rows * cols:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(rows, cols)


def _padded(small_corpus, mesh, k=5, seed=0):
    X = small_corpus
    pzd, pwz = plsa_init(X, k, rng=np.random.RandomState(seed))
    rm, cm = mesh_lib.mesh_layout_multiples(mesh, "xla")
    Xd, n, m = pad_dense_counts(sp.csr_matrix(X), row_multiple=rm, col_multiple=cm)
    zd, wz = pad_factors(pzd, pwz, Xd.shape[0], Xd.shape[1])
    return X, Xd, zd, wz, n, m, k


def test_sharded_em_step_matches_single_device(small_corpus, mesh):
    X, Xd, zd, wz, n, m, k = _padded(small_corpus, mesh)
    w = np.random.RandomState(1).uniform(0.5, 2.0, Xd.shape[0]).astype(np.float32)

    step = mesh_lib.build_sharded_em_step(mesh, inner="xla", weighted=True)
    Xs, zds, wzs, ws = mesh_lib.shard_inputs(mesh, Xd, zd, wz, w)
    got_zd, got_wz, got_ll = jax.jit(step)(Xs, zds, wzs, ws)

    want_zd, want_wz, want_ll = em_ops.em_step_dense(Xd, zd, wz, sample_weight=w)
    np.testing.assert_allclose(np.asarray(got_zd), np.asarray(want_zd), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), np.asarray(want_wz), rtol=1e-4, atol=1e-6)
    assert float(got_ll) == pytest.approx(float(want_ll), rel=1e-5)


def test_sharded_fit_matches_oracle(small_corpus, mesh):
    X, Xd, zd, wz, n, m, k = _padded(small_corpus, mesh)
    w = np.ones(Xd.shape[0], np.float32)
    run = mesh_lib.build_sharded_fit(mesh, "xla", False, 20, 5)
    Xs, zds, wzs, ws = mesh_lib.shard_inputs(mesh, Xd, zd, wz, w)
    zd_f, wz_f, steps, ll, ll_trace, n_tests = run(Xs, zds, wzs, ws, jnp.float32(0.001))

    rows, cols, vals = oracle.to_coo(X)
    want_zd, want_wz, want_steps, _ = oracle.fit(
        rows, cols, vals, zd[: X.shape[0], :k], wz[:k, : X.shape[1]], *X.shape,
        n_iter=20, n_iter_per_test=5,
    )
    assert int(steps) == want_steps
    np.testing.assert_allclose(np.asarray(zd_f)[:n, :k], want_zd, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wz_f)[:k, :m], want_wz, rtol=5e-3, atol=1e-5)


def test_block_parallel_estimator(small_corpus):
    from enstop_tpu import BlockParallelPLSA

    model = BlockParallelPLSA(
        n_components=4, n_row_blocks=4, n_col_blocks=2, n_iter=15, random_state=0
    )
    emb = model.fit_transform(sp.csr_matrix(small_corpus))
    assert emb.shape == (small_corpus.shape[0], 4)
    np.testing.assert_allclose(emb.sum(axis=1), 1.0, atol=1e-4)
    t = model.transform(sp.csr_matrix(small_corpus[:10]))
    assert t.shape == (10, 4)


def test_distributed_estimator_all_devices(small_corpus):
    from enstop_tpu import DistributedPLSA

    model = DistributedPLSA(n_components=4, n_iter=15, random_state=0)
    emb = model.fit_transform(sp.csr_matrix(small_corpus))
    assert emb.shape == (small_corpus.shape[0], 4)
    np.testing.assert_allclose(emb.sum(axis=1), 1.0, atol=1e-4)


def test_block_parallel_matches_flat_plsa(small_corpus):
    """Mesh variant must track the flat fit's trajectory given identical init
    (the reference's variants are mathematically identical by construction)."""
    from enstop_tpu import PLSA, BlockParallelPLSA

    X = sp.csr_matrix(small_corpus)
    pzd0, pwz0 = plsa_init(X, 4, rng=np.random.RandomState(5))
    flat = PLSA(n_components=4, init=(pzd0, pwz0), n_iter=20, backend="xla").fit(X)
    blocked = BlockParallelPLSA(
        n_components=4, init=(pzd0, pwz0), n_row_blocks=4, n_col_blocks=2, n_iter=20
    ).fit(X)
    np.testing.assert_allclose(
        blocked.components_, flat.components_, rtol=5e-3, atol=1e-5
    )


def test_sharded_step_with_pallas_inner_interpret(small_corpus):
    """shard_map composing with the Pallas kernel (interpret mode on CPU)."""
    mesh = mesh_lib.make_mesh(2, 1, devices=jax.devices()[:2])
    X = small_corpus
    k = 4
    from enstop_tpu.ops.init import plsa_init as pinit

    pzd, pwz = pinit(X, k, rng=np.random.RandomState(0))
    rm, cm = mesh_lib.mesh_layout_multiples(mesh, "pallas")
    Xd, n, m = pad_dense_counts(sp.csr_matrix(X), row_multiple=rm, col_multiple=cm)
    zd, wz = pad_factors(pzd, pwz, Xd.shape[0], Xd.shape[1])
    w = np.ones(Xd.shape[0], np.float32)

    step = mesh_lib.build_sharded_em_step(mesh, inner="pallas")
    Xs, zds, wzs, ws = mesh_lib.shard_inputs(mesh, Xd, zd, wz, w)
    got_zd, got_wz, got_ll = jax.jit(step)(Xs, zds, wzs, ws)

    want_zd, want_wz, want_ll = em_ops.em_step_dense(Xd, zd, wz, sample_weight=w)
    np.testing.assert_allclose(np.asarray(got_zd), np.asarray(want_zd), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_wz), np.asarray(want_wz), rtol=1e-4, atol=1e-6)
    assert float(got_ll) == pytest.approx(float(want_ll), rel=1e-5)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_stage_sharded_counts_matches_dense(shape, small_corpus):
    """Per-tile COO ship + on-device scatter == host densify, on every mesh
    geometry (host memory stays O(nnz); the dense rectangle exists only
    sharded in device memory)."""
    mesh = mesh_lib.make_mesh(*shape)
    X = sp.csr_matrix(small_corpus)
    Xs, n, m = mesh_lib.stage_sharded_counts(mesh, X)
    rm, cm = mesh_lib.mesh_layout_multiples(mesh, "xla")
    Xd, n2, m2 = pad_dense_counts(X, row_multiple=rm, col_multiple=cm)
    assert (n, m) == (n2, m2) and Xs.shape == Xd.shape
    np.testing.assert_array_equal(np.asarray(Xs), Xd)


def test_mesh_fit_through_sparse_staging_matches_flat(small_corpus):
    """Full sharded fit from the sparse-staged corpus tracks the flat fit."""
    from enstop_tpu.models.mesh import BlockParallelPLSA
    from enstop_tpu.models.plsa import PLSA
    from enstop_tpu.ops.init import plsa_init as pinit

    X = sp.csr_matrix(small_corpus)
    pzd0, pwz0 = pinit(X, 4, rng=np.random.RandomState(3))
    flat = PLSA(n_components=4, init=(pzd0, pwz0), n_iter=15, backend="xla").fit(X)
    blocked = BlockParallelPLSA(
        n_components=4, init=(pzd0, pwz0), n_row_blocks=4, n_col_blocks=2,
        n_iter=15,
    ).fit(X)
    np.testing.assert_allclose(
        blocked.components_, flat.components_, rtol=5e-3, atol=1e-5
    )


def test_mesh_estimators_expose_history(small_corpus):
    """Observability parity (VERDICT r2 item 6): BlockParallelPLSA and
    DistributedPLSA(dense) must expose the same fitted surface as PLSA —
    history_ (the convergence LL trajectory), n_iter_, fit_info_."""
    import scipy.sparse as sp

    from enstop_tpu import PLSA, BlockParallelPLSA, DistributedPLSA
    from enstop_tpu.ops.init import plsa_init

    Xs = sp.csr_matrix(small_corpus)
    pzd0, pwz0 = plsa_init(Xs, 3, rng=np.random.RandomState(3))
    ref = PLSA(n_components=3, init=(pzd0, pwz0), n_iter=15,
               backend="xla").fit(Xs)

    for cls in (BlockParallelPLSA, DistributedPLSA):
        model = cls(n_components=3, init=(pzd0, pwz0), n_iter=15,
                    backend="xla").fit(Xs)
        assert hasattr(model, "history_") and len(model.history_) >= 1
        assert model.n_iter_ == ref.n_iter_
        assert set(model.fit_info_) >= {"n_steps", "log_likelihood", "ll_trace"}
        # identical init => identical tested LL values (same math, mesh-reduced)
        np.testing.assert_allclose(model.history_, ref.history_, rtol=1e-4)
