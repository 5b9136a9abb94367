"""Mesh-sharded estimators: ``BlockParallelPLSA`` and ``DistributedPLSA``.

Drop-in successors of the reference's 2D-blocked variant
(block_parallel_plsa.py:424-538) and dask variant (distributed_plsa.py:374-489),
sharing one mesh backend (see :mod:`enstop_tpu.parallel.mesh`): the
``n_row_blocks × n_col_blocks`` tile grid becomes a ``(docs, vocab)`` device mesh
and the per-iteration reductions become ICI collectives.

``BlockParallelPLSA(n_row_blocks, n_col_blocks)`` keeps the reference's constructor
signature; the block counts are reinterpreted as the requested mesh shape (clamped
to the available devices — a mesh of one device degenerates to the single-chip
fused path, exactly as the reference's blocked variant degenerates to the flat one).

``DistributedPLSA`` spans every addressable device (multi-host when run under
``jax.distributed``); on a single host it is the same program on the local mesh —
unlike the reference, where the dask variant pays a gather-to-driver barrier per
iteration (distributed_plsa.py:131).
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import coo_matrix, issparse
from sklearn.utils import check_array, check_random_state

import jax

from ..ops.data import pad_dense_counts, pad_factors, pad_vector
from ..ops.driver import resolve_backend
from ..ops.init import plsa_init
from ..parallel import mesh as mesh_lib
from .base import TopicModelBase, reinsert_zero_rows, split_zero_rows, validate_corpus


def _inner_kind(backend):
    return "pallas" if resolve_backend(backend) == "pallas" else "xla"


def _stage_on_mesh(X, mesh, inner, row_bucket=False):
    """Sparse corpora ship as per-tile COO and densify on device (host and
    H2D stay O(nnz)); dense array inputs take the padded host path.
    ``row_bucket=True`` (the transform/serving path) pads docs to coarse
    shared buckets so similar batch sizes reuse one compiled program."""
    from scipy.sparse import issparse

    if issparse(X):
        return mesh_lib.stage_sharded_counts(mesh, X, inner=inner,
                                             row_bucket=row_bucket)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rm, cm = mesh_lib.mesh_layout_multiples(mesh, inner)
    min_rows = 1
    if row_bucket:
        from ..ops.sell import _bucket_rows

        min_rows = _bucket_rows(max(X.shape[0], 1))
    Xd, n, m = pad_dense_counts(X, row_multiple=rm, col_multiple=cm,
                                min_rows=min_rows)
    Xs = jax.device_put(Xd, NamedSharding(mesh, P("docs", "vocab")))
    return Xs, n, m


def _fit_on_mesh(
    X,
    k,
    mesh,
    inner,
    sample_weight=None,
    init="random",
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    random_state=None,
):
    import jax.numpy as jnp

    rng = check_random_state(random_state)
    pzd0, pwz0 = plsa_init(X, k, init=init, rng=rng)

    Xs, n, m = _stage_on_mesh(X, mesh, inner)
    n_pad, m_pad = Xs.shape
    zd, wz = pad_factors(pzd0, pwz0, n_pad, m_pad)

    weighted = sample_weight is not None and bool(np.any(np.asarray(sample_weight) != 1.0))
    w = pad_vector(
        np.asarray(sample_weight, np.float32) if weighted else np.ones(n, np.float32),
        n_pad,
    )

    import time as _time

    zds, wzs, ws = mesh_lib.shard_factors(mesh, zd, wz, w)
    run = mesh_lib.build_sharded_fit(
        mesh, inner, weighted, int(n_iter), int(n_iter_per_test)
    )
    t0 = _time.perf_counter()
    zd_f, wz_f, steps, final_ll, ll_trace, n_tests = run(
        Xs, zds, wzs, ws, jnp.float32(tolerance)
    )
    U = np.asarray(zd_f)[:n, :k]  # sync
    wall = _time.perf_counter() - t0
    info = {
        "n_steps": int(steps),
        "log_likelihood": float(final_ll),
        "ll_trace": np.asarray(ll_trace)[: int(n_tests)],
        "wall_time_s": wall,
    }
    return U, np.asarray(wz_f)[:k, :m], info


def _refit_on_mesh(X, topics, mesh, inner, n_iter=50, n_iter_per_test=5,
                   tolerance=0.001, random_state=None):
    import jax.numpy as jnp

    rng = check_random_state(random_state)
    k = topics.shape[0]
    pzd0 = rng.rand(X.shape[0], k)
    pzd0 /= pzd0.sum(axis=1, keepdims=True)

    Xs, n, m = _stage_on_mesh(X, mesh, inner, row_bucket=True)
    n_pad, m_pad = Xs.shape
    zd, wz = pad_factors(
        pzd0.astype(np.float32), np.asarray(topics, np.float32), n_pad, m_pad
    )
    w = np.ones(n_pad, np.float32)
    zds, wzs, ws = mesh_lib.shard_factors(mesh, zd, wz, w)
    run = mesh_lib.build_sharded_fit(
        mesh, inner, False, int(n_iter), int(n_iter_per_test), refit=True
    )
    zd_f = run(Xs, zds, wzs, ws, jnp.float32(tolerance))[0]
    return np.asarray(zd_f)[:n, :k]


class BlockParallelPLSA(TopicModelBase):
    """pLSA over a 2D (docs × vocab) device mesh (reference
    block_parallel_plsa.py:424-538 rebuilt as a sharded XLA program).

    ``n_row_blocks`` / ``n_col_blocks`` request the mesh shape; they are clamped
    to the devices actually available (their product must divide the device
    count after clamping).

    A materially-firing ``e_step_thresh`` (> 1e-30; the default 1e-32 is not)
    routes the fit to the nonzeros-sharded docs-mesh program — the
    multi-device path with the reference's exact masked E-step
    (block_parallel_plsa.py:51-57); the dense tile kernels treat sub-material
    thresholds as the numerical no-op they are.
    """

    def __init__(
        self,
        n_components=10,
        init="random",
        n_row_blocks=None,
        n_col_blocks=1,
        n_iter=100,
        n_iter_per_test=10,
        tolerance=0.001,
        e_step_thresh=1e-32,
        transform_random_seed=42,
        random_state=None,
        backend="auto",
    ):
        self.n_components = n_components
        self.init = init
        self.n_row_blocks = n_row_blocks
        self.n_col_blocks = n_col_blocks
        self.n_iter = n_iter
        self.n_iter_per_test = n_iter_per_test
        self.tolerance = tolerance
        self.e_step_thresh = e_step_thresh
        self.transform_random_seed = transform_random_seed
        self.random_state = random_state
        self.backend = backend

    def _devices(self):
        return jax.devices()

    def _make_mesh(self):
        devices = self._devices()
        n_dev = len(devices)
        cols = min(self.n_col_blocks or 1, n_dev)
        while n_dev % cols:
            cols -= 1
        rows = self.n_row_blocks if self.n_row_blocks is not None else n_dev // cols
        rows = min(rows, n_dev // cols)
        while (n_dev // cols) % rows:
            rows -= 1
        return mesh_lib.make_mesh(rows, cols, devices=devices[: rows * cols])

    def _thresh_is_material(self):
        # the dense tile kernels treat e_step_thresh as a numerical no-op
        # (the matmul form never materializes per-topic products); a
        # materially-firing threshold must run the nonzeros-sharded program,
        # the one multi-device path with the reference's exact masked E-step
        # (same routing the flat driver does, ops/driver.py)
        from ..ops.sell import THRESH_MATERIAL

        return (self.e_step_thresh is not None
                and self.e_step_thresh > THRESH_MATERIAL)

    def fit_transform(self, X, y=None, sample_weight=None):
        if self._thresh_is_material():
            return self._fit_transform_sparse(X, sample_weight)
        X, sample_weight = validate_corpus(X, sample_weight)
        data, good_rows, zero_rows_found = split_zero_rows(X)
        mesh = self._make_mesh()
        U, V, info = _fit_on_mesh(
            data,
            self.n_components,
            mesh,
            _inner_kind(self.backend),
            sample_weight=sample_weight[good_rows] if zero_rows_found else sample_weight,
            init=self.init,
            n_iter=self.n_iter,
            n_iter_per_test=self.n_iter_per_test,
            tolerance=self.tolerance,
            random_state=self.random_state,
        )
        if zero_rows_found:
            self.embedding_ = reinsert_zero_rows(U, good_rows, X.shape[0], self.n_components)
        else:
            self.embedding_ = U
        self.components_ = V
        self.training_data_ = X
        self.n_iter_ = info["n_steps"]
        self.history_ = np.asarray(info["ll_trace"], dtype=np.float64)
        self.fit_info_ = info
        return self.embedding_

    def _fit_transform_sparse(self, X, sample_weight):
        """Fit via the nonzeros-sharded docs-mesh program (exact
        ``e_step_thresh`` semantics; per-chip HBM is O(local nnz))."""
        import time as _time

        from ..parallel.sparse_mesh import make_docs_mesh, sparse_mesh_fit

        X, sample_weight = validate_corpus(X, sample_weight)
        data, good_rows, zero_rows_found = split_zero_rows(X)
        t0 = _time.perf_counter()
        U, V, n_steps, trace = sparse_mesh_fit(
            data,
            self.n_components,
            mesh=make_docs_mesh(),
            sample_weight=sample_weight[good_rows] if zero_rows_found else sample_weight,
            init=self.init,
            n_iter=self.n_iter,
            n_iter_per_test=self.n_iter_per_test,
            tolerance=self.tolerance,
            e_step_thresh=self.e_step_thresh,
            random_state=self.random_state,
        )
        if zero_rows_found:
            self.embedding_ = reinsert_zero_rows(U, good_rows, X.shape[0], self.n_components)
        else:
            self.embedding_ = U
        self.components_ = V
        self.training_data_ = X
        self.n_iter_ = n_steps
        self.history_ = np.asarray(trace, dtype=np.float64)
        self.fit_info_ = {
            "n_steps": int(n_steps),
            "log_likelihood": float(self.history_[-1]) if len(self.history_) else float("nan"),
            "ll_trace": np.asarray(trace),
            "wall_time_s": _time.perf_counter() - t0,
        }
        return self.embedding_

    def transform(self, X, y=None):
        if self._thresh_is_material():
            return self._transform_sparse(X)
        X = check_array(X, accept_sparse="csr")
        self._validate_transform_input(X)
        if not issparse(X):
            X = coo_matrix(X)
        return _refit_on_mesh(
            X,
            self.components_,
            self._make_mesh(),
            _inner_kind(self.backend),
            random_state=check_random_state(self.transform_random_seed),
        )

    def _transform_sparse(self, X):
        from ..parallel.sparse_mesh import make_docs_mesh, sparse_mesh_refit

        X = check_array(X, accept_sparse="csr")
        self._validate_transform_input(X)
        if not issparse(X):
            X = coo_matrix(X).tocsr()
        return sparse_mesh_refit(
            X,
            self.components_,
            mesh=make_docs_mesh(),
            e_step_thresh=self.e_step_thresh,
            random_state=check_random_state(self.transform_random_seed),
        )


class DistributedPLSA(BlockParallelPLSA):
    """pLSA across every addressable device (reference distributed_plsa.py:374-489).

    Same program as :class:`BlockParallelPLSA`; under ``jax.distributed`` the mesh
    spans hosts and the psums ride ICI/DCN.  Note the reference's dask variant
    does not support ``sample_weight`` (distributed_plsa.py:448-449); this one does.

    ``layout="sparse"`` shards the corpus by its NONZEROS over a docs mesh
    (parallel/sparse_mesh.py): per-chip HBM holds only that chip's entries plus
    the replicated topics — the reference's O(nnz) complexity, distributed.
    Use it when the dense per-chip tile would not fit.
    """

    def __init__(
        self,
        n_components=10,
        init="random",
        n_row_blocks=None,
        n_col_blocks=1,
        n_iter=100,
        n_iter_per_test=10,
        tolerance=0.001,
        e_step_thresh=1e-32,
        transform_random_seed=42,
        random_state=None,
        backend="auto",
        layout="dense",
    ):
        super().__init__(
            n_components=n_components,
            init=init,
            n_row_blocks=n_row_blocks,
            n_col_blocks=n_col_blocks,
            n_iter=n_iter,
            n_iter_per_test=n_iter_per_test,
            tolerance=tolerance,
            e_step_thresh=e_step_thresh,
            transform_random_seed=transform_random_seed,
            random_state=random_state,
            backend=backend,
        )
        self.layout = layout

    def fit_transform(self, X, y=None, sample_weight=None):
        if self.layout not in ("dense", "sparse"):
            raise ValueError(
                "layout must be 'dense' or 'sparse', got {!r}".format(self.layout)
            )
        if self.layout == "sparse":
            return self._fit_transform_sparse(X, sample_weight)
        return super().fit_transform(X, y=y, sample_weight=sample_weight)

    def transform(self, X, y=None):
        if self.layout == "sparse":
            return self._transform_sparse(X)
        return super().transform(X, y=y)

    def _make_mesh(self):
        devices = jax.devices()
        n_dev = len(devices)
        cols = min(self.n_col_blocks or 1, n_dev)
        while n_dev % cols:
            cols -= 1
        return mesh_lib.make_mesh(n_dev // cols, cols, devices=devices)
