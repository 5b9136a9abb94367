"""Mesh-sharded sparse EM (parallel/sparse_mesh.py): the O(nnz) layout over a
docs mesh must reproduce the single-device sparse/flat fit exactly."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from conftest import make_corpus
from enstop_tpu.ops.driver import plsa_fit
from enstop_tpu.parallel.sparse_mesh import make_docs_mesh, sparse_mesh_fit


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sparse_mesh_matches_flat(n_shards):
    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=61,
                                  n_docs=101, n_words=130))
    mesh = make_docs_mesh(n_shards)
    zd_m, wz_m, steps_m, trace_m = sparse_mesh_fit(
        X, 4, mesh=mesh, n_iter=25, n_iter_per_test=5, tolerance=0.01,
        random_state=3,
    )
    zd_f, wz_f, info = plsa_fit(
        X, 4, backend="xla", n_iter=25, n_iter_per_test=5, tolerance=0.01,
        random_state=3, return_info=True,
    )
    assert steps_m == info["n_steps"]
    np.testing.assert_allclose(trace_m, info["ll_trace"], rtol=1e-4)
    np.testing.assert_allclose(wz_m, wz_f, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(zd_m, zd_f, rtol=5e-3, atol=1e-5)


def test_sparse_mesh_weighted():
    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=67,
                                  n_docs=80, n_words=100))
    w = np.random.RandomState(9).uniform(0.3, 2.0, X.shape[0]).astype(np.float32)
    mesh = make_docs_mesh(4)
    zd_m, wz_m, _, _ = sparse_mesh_fit(X, 3, mesh=mesh, sample_weight=w,
                                       n_iter=12, random_state=5)
    zd_f, wz_f = plsa_fit(X, 3, sample_weight=w, backend="xla", n_iter=12,
                          random_state=5)
    np.testing.assert_allclose(wz_m, wz_f, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(zd_m, zd_f, rtol=5e-3, atol=1e-5)


def test_sparse_mesh_memory_is_sharded():
    """Each shard's arrays cover only its document range's nonzeros."""
    from enstop_tpu.parallel.sparse_mesh import shard_sell

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=71,
                                  n_docs=96, n_words=120))
    mesh = make_docs_mesh(8)
    dev, starts, n, m = shard_sell(mesh, X)
    assert dev["vals_a"].shape[0] == 8
    # nonzeros present exactly once across shards
    total = float(np.asarray(dev["vals_a"]).sum())
    assert total == pytest.approx(float(X.sum()), rel=1e-6)


def test_distributed_plsa_sparse_layout():
    """DistributedPLSA(layout='sparse') end-to-end on the 8-device mesh."""
    from enstop_tpu import DistributedPLSA

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=73,
                                  n_docs=88, n_words=110).astype(np.int64))
    m = DistributedPLSA(n_components=4, n_iter=20, random_state=0,
                        layout="sparse").fit(X)
    assert m.embedding_.shape == (88, 4)
    np.testing.assert_allclose(m.components_.sum(1), 1.0, rtol=1e-4)
    assert m.history_[-1] > m.history_[0]
    # matches the dense-layout mesh fit at identical init
    md = DistributedPLSA(n_components=4, n_iter=20, random_state=0).fit(X)
    np.testing.assert_allclose(m.components_, md.components_, rtol=5e-3, atol=1e-5)


def test_sparse_mesh_thresh_matches_single_chip():
    """A materially-firing e_step_thresh runs the exact masked form on the
    mesh and reproduces the single-chip sparse fit's trajectory."""
    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=83,
                                  n_docs=90, n_words=115))
    mesh = make_docs_mesh(4)
    zd_m, wz_m, steps_m, trace_m = sparse_mesh_fit(
        X, 4, mesh=mesh, n_iter=18, n_iter_per_test=6, tolerance=0.005,
        e_step_thresh=1e-3, random_state=11,
    )
    zd_f, wz_f, info = plsa_fit(
        X, 4, backend="sparse", n_iter=18, n_iter_per_test=6, tolerance=0.005,
        e_step_thresh=1e-3, random_state=11, return_info=True,
    )
    assert steps_m == info["n_steps"]
    np.testing.assert_allclose(trace_m, info["ll_trace"], rtol=1e-4)
    np.testing.assert_allclose(wz_m, wz_f, rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(zd_m, zd_f, rtol=5e-3, atol=1e-5)
    # and the thresholded fit genuinely differs from the unthresholded one
    _, wz_u, _, _ = sparse_mesh_fit(
        X, 4, mesh=mesh, n_iter=18, n_iter_per_test=6, tolerance=0.005,
        random_state=11,
    )
    assert np.abs(wz_m - wz_u).max() > 1e-6


def test_sparse_mesh_refit_thresh():
    """Sparse-layout transform honors e_step_thresh like the flat refit."""
    from enstop_tpu.ops.driver import plsa_refit
    from enstop_tpu.parallel.sparse_mesh import sparse_mesh_refit

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=89,
                                  n_docs=60, n_words=90))
    _, wz, _, _ = sparse_mesh_fit(X, 3, mesh=make_docs_mesh(2), n_iter=10,
                                  random_state=2)
    t = sparse_mesh_refit(X[:15], wz, mesh=make_docs_mesh(4),
                          e_step_thresh=1e-3, random_state=7)
    flat = plsa_refit(X[:15], wz, backend="sparse", e_step_thresh=1e-3,
                      random_state=7)
    np.testing.assert_allclose(t, flat, rtol=5e-3, atol=1e-5)


def test_shard_sell_per_side_lanes():
    """When shards' auto lanes disagree, the unified lanes take each SIDE's
    own maximum — the narrow side must not inflate to the wide side's lane."""
    from enstop_tpu.ops.sell import _auto_lane, pack_sell
    from enstop_tpu.parallel.sparse_mesh import shard_sell

    rng = np.random.RandomState(17)
    # top half dense rows, bottom half sparse rows -> doc-side auto lanes
    # differ between the two shards; vocabulary much smaller than docs so the
    # word side is far wider than the doc side
    top = (rng.rand(40, 48) < 0.6).astype(np.float32)
    bot = (rng.rand(40, 48) < 0.05).astype(np.float32)
    bot[:, 0] = 1.0  # no empty rows
    X = sp.csr_matrix(np.concatenate([top, bot]))
    mesh = make_docs_mesh(2)
    dev, starts, n, m = shard_sell(mesh, X)

    lane_docs = [pack_sell(X[:40]).cols_a.shape[1],
                 pack_sell(X[40:]).cols_a.shape[1]]
    lane_words = [pack_sell(X[:40]).rows_b.shape[1],
                  pack_sell(X[40:]).rows_b.shape[1]]
    assert len(set(lane_docs)) > 1 or len(set(lane_words)) > 1  # lanes disagree
    assert dev["cols_a"].shape[2] == max(lane_docs)
    assert dev["rows_b"].shape[2] == max(lane_words)
    # entries preserved exactly once
    assert float(np.asarray(dev["vals_a"]).sum()) == pytest.approx(
        float(X.sum()), rel=1e-6)
    # and the fit still reproduces the flat trajectory on this corpus
    zd_m, wz_m, _, _ = sparse_mesh_fit(X, 3, mesh=mesh, n_iter=10,
                                       random_state=1)
    zd_f, wz_f = plsa_fit(X, 3, backend="xla", n_iter=10, random_state=1)
    np.testing.assert_allclose(wz_m, wz_f, rtol=5e-3, atol=1e-5)


def test_dense_layout_material_thresh_routes_to_exact_path():
    """BlockParallelPLSA / DistributedPLSA(layout='dense') with a materially-
    firing e_step_thresh must honor it (via the nonzeros-sharded program)
    rather than silently dropping it like the dense tile kernels would."""
    from enstop_tpu import BlockParallelPLSA, DistributedPLSA

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=97,
                                  n_docs=70, n_words=92).astype(np.int64))
    m_bp = BlockParallelPLSA(n_components=3, n_iter=12, random_state=0,
                             e_step_thresh=1e-3).fit(X)
    zd_f, wz_f = plsa_fit(X, 3, backend="sparse", n_iter=12,
                          e_step_thresh=1e-3, random_state=0)
    np.testing.assert_allclose(m_bp.components_, wz_f, rtol=5e-3, atol=1e-5)
    t = m_bp.transform(X[:10])
    assert t.shape == (10, 3)
    # the dense-layout DistributedPLSA inherits the same routing
    m_d = DistributedPLSA(n_components=3, n_iter=12, random_state=0,
                          e_step_thresh=1e-3).fit(X)
    np.testing.assert_allclose(m_d.components_, wz_f, rtol=5e-3, atol=1e-5)
    # and sub-material thresholds (the default 1e-32) stay on the dense path:
    # its result matches the unthresholded fit, not the thresholded one
    m_dense = BlockParallelPLSA(n_components=3, n_iter=12, random_state=0).fit(X)
    zd_u, wz_u = plsa_fit(X, 3, backend="xla", n_iter=12, random_state=0)
    np.testing.assert_allclose(m_dense.components_, wz_u, rtol=5e-3, atol=1e-5)
    assert "wall_time_s" in m_dense.fit_info_


def test_sparse_mesh_batches_share_program_shapes():
    """Similar-but-unequal corpus sizes must reach the compiled mesh program
    with identical shard shapes and shard height (bucketed), so one compile
    serves them all."""
    from enstop_tpu.ops.sell import _bucket_rows
    from enstop_tpu.parallel.sparse_mesh import shard_sell

    mesh = make_docs_mesh(4)
    X = sp.random(1180, 400, density=0.05,
                  random_state=np.random.RandomState(23), format="csr")
    X.data = np.ceil(X.data * 3).astype(np.float32)
    X = sp.csr_matrix(X)
    shapes = set()
    for lo, hi in ((0, 1100), (40, 1144), (80, 1180)):  # overlapping batches
        dev, starts, n, m = shard_sell(mesh, X[lo:hi])
        shapes.add(tuple(sorted((k, v.shape) for k, v in dev.items()))
                   + (_bucket_rows(-(-n // 4)),))
    assert len(shapes) == 1, {s[-1] for s in shapes}


def test_sparse_mesh_transform():
    """Sparse-layout transform runs the refit sharded over the docs mesh and
    agrees with the flat refit."""
    from enstop_tpu import DistributedPLSA
    from enstop_tpu.ops.driver import plsa_refit

    X = sp.csr_matrix(make_corpus(np.random.RandomState(0), seed=79,
                                  n_docs=77, n_words=95).astype(np.int64))
    m = DistributedPLSA(n_components=4, n_iter=15, random_state=0,
                        layout="sparse").fit(X)
    t = m.transform(X[:20])
    assert t.shape == (20, 4)
    flat = plsa_refit(X[:20], m.components_, backend="xla",
                      random_state=m.transform_random_seed)
    np.testing.assert_allclose(t, flat, rtol=5e-3, atol=1e-5)


@pytest.mark.parametrize("n_shards,seed", [(1, 7), (2, 19), (4, 31), (8, 43)])
def test_sparse_mesh_refit_matches_flat_across_shapes(n_shards, seed):
    """VERDICT r04 item 7: fuzzed trajectory equality of the sharded sparse
    REFIT vs the single-chip refit across mesh widths (incl. the degenerate
    1-device mesh), fresh corpus and topics per shape."""
    from enstop_tpu.ops.driver import plsa_refit
    from enstop_tpu.parallel.sparse_mesh import sparse_mesh_refit

    r = np.random.RandomState(seed)
    X = sp.csr_matrix(make_corpus(r, seed=seed, n_docs=50 + 9 * n_shards,
                                  n_words=80 + 3 * seed))
    _, wz, _, _ = sparse_mesh_fit(X, 3, mesh=make_docs_mesh(2), n_iter=8,
                                  random_state=seed)
    mesh = make_docs_mesh(n_shards)
    got = sparse_mesh_refit(X, wz, mesh=mesh, random_state=seed + 1)
    want = plsa_refit(X, wz, backend="sparse", random_state=seed + 1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)
