"""Compiled-program reuse across repeat fits.

On this environment every remote compile costs 30 s - 10+ min, so the
program builders must return the SAME jitted callable for the same layout
(mesh/shape/flags) — estimators rebuild their programs on every
fit/transform and must not pay the compile twice.
"""

import jax
import numpy as np

from enstop_tpu.parallel import mesh as mesh_mod
from enstop_tpu.parallel import sparse_mesh as sparse_mod
from enstop_tpu.models import streamed_core


def test_distinct_similar_corpora_share_one_sparse_fit_program():
    """Shape bucketing end-to-end: fitting two DIFFERENT equal-length document
    windows (serving batches: same batch size, different content and nnz)
    through the sparse backend compiles the fit program exactly once — the
    second fit reuses the first's executable."""
    import logging

    import scipy.sparse as sp

    from enstop_tpu.ops.driver import plsa_fit

    X = sp.random(1300, 420, density=0.04,
                  random_state=np.random.RandomState(7), format="csr")
    X.data = np.ceil(X.data * 3).astype(np.float32)
    X = sp.csr_matrix(X)

    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(handler)
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        for lo, hi in ((0, 1150), (150, 1300)):
            plsa_fit(X[lo:hi], 4, backend="sparse", n_iter=6, random_state=0)
    finally:
        jax.config.update("jax_log_compiles", old)
        logger.removeHandler(handler)
    fit_compiles = [r for r in records if "jit(run)" in r]
    assert len(fit_compiles) == 1, fit_compiles


def test_dense_transform_batches_share_one_refit_program():
    """Serving on the DENSE path (round-4): transform batches of varying
    sizes within one row bucket — including sizes that differ after
    zero-row stripping — must compile the refit program exactly once.
    Before row-bucketing the dense staging, every distinct padded height
    was its own program (6 batches = 6 remote compiles)."""
    import logging

    import scipy.sparse as sp

    from enstop_tpu import PLSA

    X = sp.random(2600, 300, density=0.05,
                  random_state=np.random.RandomState(3), format="csr")
    X.data = np.ceil(X.data * 3).astype(np.float32)
    X = sp.csr_matrix(X)
    model = PLSA(n_components=4, n_iter=6, random_state=0).fit(X)

    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(handler)
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        outs = []
        for i, s in enumerate([900, 1000, 960, 1015]):
            lo = (i * 37) % (X.shape[0] - s)
            outs.append(model.transform(X[lo:lo + s]))
    finally:
        jax.config.update("jax_log_compiles", old)
        logger.removeHandler(handler)
    refit_compiles = [r for r in records if "jit(run)" in r]
    assert len(refit_compiles) == 1, refit_compiles
    for out, s in zip(outs, [900, 1000, 960, 1015]):
        assert out.shape == (s, 4)
        assert np.isfinite(out).all()


def test_dense_refit_bucketing_is_trajectory_invariant():
    """The bucketed absorbing rows must not change the refit result: same
    batch refit through plsa_refit (bucketed staging) == refit through a
    PreparedCounts staged exactly (no bucketing)."""
    import scipy.sparse as sp

    from enstop_tpu.ops.driver import plsa_refit, prepare_counts

    rng = np.random.RandomState(5)
    X = sp.csr_matrix(rng.poisson(0.4, (700, 256)).astype(np.int64))
    topics = rng.rand(3, 256).astype(np.float32)
    topics /= topics.sum(1, keepdims=True)

    emb_bucketed = plsa_refit(X, topics, n_iter=6, random_state=7)
    emb_exact = plsa_refit(prepare_counts(X), topics, n_iter=6, random_state=7)
    np.testing.assert_array_equal(emb_bucketed, emb_exact)


def test_prepare_counts_row_bucket_shares_shapes_ulp_equal_fit():
    """Opt-in fit bucketing: similar-sized corpora prepared with
    row_bucket=True land on one device-array shape (one fit program), and
    the bucketed fit agrees with the exact-padded fit to f32
    summation-order rounding (the column-reduction tree changes with padded
    length, so bit-equality is not expected — refits ARE bit-equal, see the
    trajectory-invariance tests)."""
    import scipy.sparse as sp

    from enstop_tpu.ops.driver import plsa_fit, prepare_counts

    X1 = sp.csr_matrix(np.random.RandomState(0).poisson(0.5, (900, 256))
                       .astype(np.int64))
    X2 = sp.csr_matrix(np.random.RandomState(1).poisson(0.5, (1000, 256))
                       .astype(np.int64))
    p1 = prepare_counts(X1, row_bucket=True)
    p2 = prepare_counts(X2, row_bucket=True)
    assert p1.device_array.shape == p2.device_array.shape
    assert (p1.n, p2.n) == (900, 1000)  # logical sizes preserved

    zd_b, wz_b = plsa_fit(p1, 3, n_iter=8, random_state=0)
    zd_e, wz_e = plsa_fit(X1, 3, n_iter=8, random_state=0)
    assert zd_b.shape == zd_e.shape == (900, 3)
    np.testing.assert_allclose(wz_b, wz_e, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(zd_b, zd_e, rtol=1e-4, atol=1e-7)


def test_mesh_transform_batches_share_one_refit_program():
    """Round-4: the MESH transform path buckets its padded doc height too —
    varying serving batch sizes must reuse one compiled sharded refit
    program (and one per-tile densify program)."""
    import logging

    import scipy.sparse as sp

    from enstop_tpu import DistributedPLSA

    X = sp.random(2600, 300, density=0.05,
                  random_state=np.random.RandomState(4), format="csr")
    X.data = np.ceil(X.data * 3).astype(np.float32)
    X = sp.csr_matrix(X)
    model = DistributedPLSA(n_components=4, n_iter=6, random_state=0).fit(X)

    # the sharded refit program may already be compiled by earlier tests on
    # the same (cached) mesh — drop it so the count below is exactly "one
    # compile for the first batch, zero for the rest"
    mesh_mod._sharded_fit_program.cache_clear()

    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(handler)
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        outs = []
        for i, s in enumerate([900, 1000, 960, 1015]):
            lo = (i * 37) % (X.shape[0] - s)
            outs.append(model.transform(X[lo:lo + s]))
    finally:
        jax.config.update("jax_log_compiles", old)
        logger.removeHandler(handler)
    refit_compiles = [r for r in records if "jit(run_inner)" in r]
    assert len(refit_compiles) == 1, refit_compiles
    for out, s in zip(outs, [900, 1000, 960, 1015]):
        assert out.shape == (s, 4)
        assert np.isfinite(out).all()


def test_mesh_refit_bucketing_is_trajectory_invariant():
    """Bucketed mesh refit == unbucketed mesh refit on the same batch."""
    import scipy.sparse as sp

    from enstop_tpu.models.mesh import _refit_on_mesh, _stage_on_mesh

    rng = np.random.RandomState(6)
    X = sp.csr_matrix(rng.poisson(0.4, (700, 256)).astype(np.int64))
    topics = rng.rand(3, 256).astype(np.float32)
    topics /= topics.sum(1, keepdims=True)
    msh = mesh_mod.make_mesh(4, 2)

    emb_bucketed = _refit_on_mesh(X, topics, msh, "xla", n_iter=6,
                                  random_state=7)

    # hand-staged exact (unbucketed) refit with the identical init draw
    import jax.numpy as jnp

    from enstop_tpu.ops.data import pad_factors

    rng2 = np.random.RandomState(7)
    pzd0 = rng2.rand(X.shape[0], 3)
    pzd0 /= pzd0.sum(axis=1, keepdims=True)
    Xs, n, m = _stage_on_mesh(X, msh, "xla", row_bucket=False)
    zd, wz = pad_factors(pzd0.astype(np.float32), topics, *Xs.shape)
    w = np.ones(Xs.shape[0], np.float32)
    zds, wzs, ws = mesh_mod.shard_factors(msh, zd, wz, w)
    run = mesh_mod.build_sharded_fit(msh, "xla", False, 6, 5, refit=True)
    emb_exact = np.asarray(run(Xs, zds, wzs, ws, jnp.float32(0.001))[0])[:n, :3]
    np.testing.assert_array_equal(emb_bucketed, emb_exact)


def test_fuzz_bucketed_transform_matches_exact_refit():
    """Serving fuzz: random batch sizes (incl. batches containing all-zero
    doc rows) through the bucketed dense refit staging must match the
    exact-staged refit bit-for-bit on identical seeds."""
    import scipy.sparse as sp

    from enstop_tpu.ops.driver import plsa_refit, prepare_counts

    rng = np.random.RandomState(11)
    topics = rng.rand(4, 192).astype(np.float32)
    topics /= topics.sum(1, keepdims=True)
    for trial in range(5):
        n = int(rng.randint(40, 1400))
        Xb = sp.random(n, 192, density=0.03, random_state=rng, format="csr")
        # integer counts: floats would be l1-standardized by prepare_counts
        # but staged as-given by the raw refit path — not a bucketing issue
        Xb.data = np.ceil(Xb.data * 4).astype(np.int64)
        Xb = sp.csr_matrix(Xb)  # sparse random rows can be all-zero — kept
        seed = int(rng.randint(0, 2**31 - 1))
        emb_b = plsa_refit(Xb, topics, n_iter=5, random_state=seed)
        emb_e = plsa_refit(prepare_counts(Xb), topics, n_iter=5,
                           random_state=seed)
        assert emb_b.shape == (n, 4)
        np.testing.assert_array_equal(emb_b, emb_e, err_msg=f"trial {trial} n={n}")


def test_sharded_program_builders_are_cached():
    m = mesh_mod.make_mesh(4, 2)
    assert mesh_mod.build_sharded_em_step(m, inner="xla") is (
        mesh_mod.build_sharded_em_step(m, inner="xla")
    )
    assert mesh_mod.build_sharded_ll(m) is mesh_mod.build_sharded_ll(m)
    assert mesh_mod.build_sharded_refit_step(m) is (
        mesh_mod.build_sharded_refit_step(m)
    )
    assert mesh_mod._sharded_fit_program(m, "xla", True, False) is (
        mesh_mod._sharded_fit_program(m, "xla", True, False)
    )
    # different layout -> different program
    m2 = mesh_mod.make_mesh(2, 4)
    assert mesh_mod._sharded_fit_program(m2, "xla", True, False) is not (
        mesh_mod._sharded_fit_program(m, "xla", True, False)
    )

    rm = mesh_mod.make_runs_mesh(4)
    assert mesh_mod.build_ensemble_runs_sharded(rm) is (
        mesh_mod.build_ensemble_runs_sharded(rm)
    )


def test_sparse_and_streamed_program_builders_are_cached():
    dm = sparse_mod.make_docs_mesh(4)
    assert sparse_mod._sparse_fit_program(dm, 16, 32, False, None) is (
        sparse_mod._sparse_fit_program(dm, 16, 32, False, None)
    )
    assert sparse_mod._sparse_fit_program(dm, 16, 32, False, 1e-3) is not (
        sparse_mod._sparse_fit_program(dm, 16, 32, False, None)
    )
    assert streamed_core._block_step_fns(False, None) is (
        streamed_core._block_step_fns(False, None)
    )
    assert streamed_core._finish_wz_fn(True) is streamed_core._finish_wz_fn(True)
    assert streamed_core._finish_wz_fn(True) is not streamed_core._finish_wz_fn(False)


def test_cached_sharded_fit_still_correct():
    # the thin build_sharded_fit wrapper binds iteration counts around the
    # cached program; two different schedules must still produce the
    # reference trajectory semantics (same final state for a converged fit)
    rng = np.random.default_rng(0)
    n, m_, k = 32, 256, 4
    X = (rng.random((n, m_)) < 0.05).astype(np.float32)
    msh = mesh_mod.make_mesh(8, 1)
    rm, cm = mesh_mod.mesh_layout_multiples(msh, "xla")
    from enstop_tpu.ops.data import round_up

    n_pad, m_pad = round_up(n, rm), round_up(m_, cm)
    Xp = np.zeros((n_pad, m_pad), np.float32)
    Xp[:n, :m_] = X
    zd = np.full((n_pad, k), 1.0 / k, np.float32)
    zd[:n] = rng.random((n, k)).astype(np.float32)
    zd[:n] /= zd[:n].sum(1, keepdims=True)
    wz = rng.random((k, m_pad)).astype(np.float32) + 0.1
    wz[:, m_:] = 1e-9
    wz /= wz.sum(1, keepdims=True)
    w = np.ones(n_pad, np.float32)

    Xs, zds, wzs, ws = mesh_mod.shard_inputs(msh, Xp, zd, wz, w)
    run_a = mesh_mod.build_sharded_fit(msh, "xla", True, 20, 5)
    run_b = mesh_mod.build_sharded_fit(msh, "xla", True, 20, 5)
    out_a = run_a(Xs, zds, wzs, ws, 0.0)
    out_b = run_b(Xs, zds, wzs, ws, 0.0)
    np.testing.assert_allclose(
        np.asarray(out_a[0]), np.asarray(out_b[0]), rtol=0, atol=0
    )
    assert int(out_a[2]) == 20
