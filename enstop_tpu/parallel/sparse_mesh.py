"""Mesh-sharded SPARSE EM: the O(nnz) layout distributed over the docs axis.

Composes the two round-2 capabilities: corpora too large for one chip's HBM
even as nonzeros ride a 1D ``("docs",)`` mesh with the dual-sorted SELL layout
(ops/sell.py) sharded by document range —

* each device holds ITS document range's nonzeros, packed independently in
  both sort orders (local doc ids, global word ids) and padded to the common
  maximum shapes so ``shard_map`` sees uniform shards;
* ``P(z|d)`` is doc-sharded (no collective: its update and row normalization
  are doc-local, exactly like the reference's per-block M-step);
* ``P(w|z)`` is replicated; each device's word pass produces a full-width
  ``(m, k)`` partial accumulator from its own entries, combined with ONE
  ``psum`` over the docs axis (the reference's cross-block shard sum,
  block_parallel_plsa.py:182-185, over ICI);
* the convergence log-likelihood is a scalar ``psum``.

This is the TPU-native successor of the reference's dask-distributed variant
(distributed_plsa.py:54-133) at the reference's own O(nnz) memory complexity —
per-chip HBM holds only that chip's nonzeros plus the replicated topics.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import sell as sell_ops
from ..ops.fit import em_fit_loop_folded

_TINY = 1e-30

__all__ = ["make_docs_mesh", "shard_sell", "build_sharded_sparse_fit"]


def make_docs_mesh(n_shards=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n_shards = n_shards or len(devices)
    return Mesh(np.asarray(devices[:n_shards]), axis_names=("docs",))


_pad_rows = sell_ops.pad_rows  # the shared absorbing-row padder


def shard_sell(mesh, X, lane=None):
    """Pack each device's document range independently; pad to uniform shapes;
    place with a leading device axis sharded over ``docs``.

    Returns ``(dev_arrays, doc_starts, n, m)`` where ``dev_arrays`` is a dict
    of (n_dev, ...) arrays sharded on axis 0 and ``doc_starts`` the global
    offset of each shard's documents.
    """
    from scipy.sparse import csr_matrix, issparse

    if not issparse(X):
        X = csr_matrix(np.asarray(X))
    Xcsr = X.tocsr()
    n, m = Xcsr.shape
    n_dev = mesh.shape["docs"]
    bounds = np.linspace(0, n, n_dev + 1).astype(np.int64)

    # uniform lane widths across shards, decided from indptr alone BEFORE any
    # packing (auto-lane needs only nnz/rows, so no pack-then-repack pass) —
    # PER SIDE: doc and word occupancies differ by orders of magnitude, so
    # collapsing both sides to one max lane would inflate the narrow side's
    # padded gather/einsum work up to ~8x
    if lane is not None:
        lane_d = lane_w = lane
    else:
        lane_d = lane_w = 8
        indptr = Xcsr.indptr
        for d in range(n_dev):
            lo, hi = int(bounds[d]), int(bounds[d + 1])
            nnz_s = int(indptr[hi] - indptr[lo])
            lane_d = max(lane_d, sell_ops._auto_lane(nnz_s, hi - lo))
            lane_w = max(lane_w, sell_ops._auto_lane(nnz_s, m))
    sides = []
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        sides.append(sell_ops.pack_sell(Xcsr[lo:hi], lane=lane_d,
                                        lane_words=lane_w))

    names = ["row_doc", "cols_a", "vals_a", "col_word", "rows_b", "vals_b"]
    # bucket the common shard height (sell_ops._bucket_rows, worst case
    # ~6-12% absorbing rows) so similar corpora/batches reach the compiled
    # mesh program with identical shard shapes
    maxes = {k: sell_ops._bucket_rows(max(getattr(s, k).shape[0] for s in sides))
             for k in names}
    stacked = {
        k: np.stack([_pad_rows(getattr(s, k), maxes[k]) for s in sides])
        for k in names
    }
    sharding = NamedSharding(mesh, P("docs"))
    dev = {k: jax.device_put(v, sharding) for k, v in stacked.items()}
    return dev, bounds[:-1], n, m


@lru_cache(maxsize=32)
def _sparse_fit_program(mesh, local_docs, m, refit, thresh):
    """The cached jitted sparse-fit program for a (mesh, local_docs, m, refit,
    thresh) layout.  Iteration counts/tolerance enter as traced arguments, so
    one remote compile covers every fit/refit on that layout (remote compiles
    cost 30s+ here).  ``thresh``: None for the fast r-form, or a materially-
    firing ``e_step_thresh`` applied with the reference's exact semantics
    (same forms as :func:`ops.sell.em_step_sell` — with thresholding the
    pass contribs already include the old factor, so the M-step numerators
    are the raw accumulators)."""

    def local_em(dev, zd_l, wz, w_l):
        # doc pass: local docs only; word pass: full-width partial + psum
        wzT = wz.T
        zd_rows = zd_l[dev["row_doc"]]
        contrib, s = sell_ops._pass_contrib(
            zd_rows, dev["cols_a"], dev["vals_a"], wzT, thresh
        )
        B = sell_ops._segsum_scatter(contrib, dev["row_doc"], local_docs)
        num_zd = (zd_l * B) if thresh is None else B
        new_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)

        wz_rows = wzT[dev["col_word"]]
        vals_b = dev["vals_b"] * w_l[dev["rows_b"]]
        contrib2, _ = sell_ops._pass_contrib(
            wz_rows, dev["rows_b"], vals_b, zd_l, thresh
        )
        A_T_local = sell_ops._segsum_scatter(contrib2, dev["col_word"], m)
        A_T = lax.psum(A_T_local, "docs")                 # the ONE collective
        num_wz = (wz * A_T.T) if thresh is None else A_T.T
        new_wz = num_wz / jnp.maximum(num_wz.sum(axis=1, keepdims=True), _TINY)

        term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
        ll = lax.psum((term * w_l[dev["row_doc"]][:, None]).sum(), "docs")
        return new_zd, new_wz, ll

    def local_refit(dev, zd_l, wz, w_l):
        wzT = wz.T
        zd_rows = zd_l[dev["row_doc"]]
        contrib, s = sell_ops._pass_contrib(
            zd_rows, dev["cols_a"], dev["vals_a"], wzT, thresh
        )
        B = sell_ops._segsum_scatter(contrib, dev["row_doc"], local_docs)
        num_zd = (zd_l * B) if thresh is None else B
        new_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)
        term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
        ll = lax.psum((term * w_l[dev["row_doc"]][:, None]).sum(), "docs")
        return new_zd, ll

    dev_spec = {k: P("docs") for k in
                ("row_doc", "cols_a", "vals_a", "col_word", "rows_b", "vals_b")}

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(dev_spec, P("docs", None), P(None, None), P("docs"),
                  P(), P(), P()),
        out_specs=(P("docs", None), P(None, None), P(), P(), P(), P()),
        check_vma=False,
    )
    def run_local(dev, zd, wz, w, tol, n_iter_, npt_):
        # strip the leading device axis (block size 1 per device)
        dev = {k: v[0] for k, v in dev.items()}

        if refit:
            def step_ll(state):
                new_zd, ll = local_refit(dev, state[0], state[1], w)
                return (new_zd, state[1]), ll
        else:
            def step_ll(state):
                new_zd, new_wz, ll = local_em(dev, state[0], state[1], w)
                return (new_zd, new_wz), ll

        def ll_of(state):
            wzT = state[1].T
            zd_rows = state[0][dev["row_doc"]]
            g = wzT[dev["cols_a"]]
            s = jnp.einsum("rk,rlk->rl", zd_rows, g)
            term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
            return lax.psum((term * w[dev["row_doc"]][:, None]).sum(), "docs")

        res = em_fit_loop_folded(step_ll, step_ll, ll_of, (zd, wz),
                                 n_iter_, npt_, tol)
        return (res.state[0], res.state[1], res.n_steps, res.final_ll,
                res.ll_trace, res.n_tests)

    @jax.jit
    def run(dev, zd, wz, w, tol, n_iter_, npt_):
        return run_local(dev, zd, wz, w, tol, n_iter_, npt_)

    from ..aot_cache import maybe_wrap

    return maybe_wrap(run, name=f"sparsemesh-{'refit' if refit else 'em'}")


def _material_thresh(e_step_thresh):
    """None unless the threshold can actually fire in f32 (matches the
    single-chip SELL gating, ops/sell.py)."""
    if e_step_thresh is not None and e_step_thresh > sell_ops.THRESH_MATERIAL:
        return float(e_step_thresh)
    return None


def build_sharded_sparse_fit(mesh, n_iter, n_iter_per_test, local_docs, m,
                             refit=False, e_step_thresh=None):
    """Compiled sparse fit over the docs mesh.

    ``local_docs``: documents per shard (the padded uniform shard height for
    the doc-sharded ``P(z|d)``); ``m``: vocabulary size.
    Call with doc-sharded ``zd (n_dev*local_docs, k)``, replicated ``wz`` and
    doc-sharded weights ``w``.  ``e_step_thresh`` is honored exactly when
    material, like the single-chip sparse backend.
    """
    run = _sparse_fit_program(mesh, int(local_docs), int(m), bool(refit),
                              _material_thresh(e_step_thresh))

    def runner(dev, zd, wz, w, tolerance):
        return run(dev, zd, wz, w, jnp.float32(tolerance),
                   jnp.int32(n_iter), jnp.int32(n_iter_per_test))

    return runner


def _scatter_doc_sharded(rows, bounds, n_dev, local_docs):
    """Lay global per-doc rows into the padded doc-sharded layout: shard d's
    docs occupy rows [d*local_docs, d*local_docs + shard_height)."""
    out = np.zeros((n_dev * local_docs,) + rows.shape[1:], np.float32)
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        out[d * local_docs: d * local_docs + (hi - lo)] = rows[lo:hi]
    return out


def _gather_doc_sharded(sharded, bounds, n_dev, local_docs, n, k):
    """Inverse of :func:`_scatter_doc_sharded` (drops the shard padding)."""
    out = np.zeros((n, k), np.float32)
    for d in range(n_dev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        out[lo:hi] = sharded[d * local_docs: d * local_docs + (hi - lo), :k]
    return out


def sparse_mesh_fit(
    X,
    k,
    mesh=None,
    sample_weight=None,
    init="random",
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=None,
    random_state=None,
):
    """Fit pLSA with the corpus sharded by nonzeros over a docs mesh.

    Returns ``(p_z_given_d, p_w_given_z, n_steps, ll_trace)``.
    """
    from sklearn.utils import check_random_state

    from ..ops.init import plsa_init

    rng = check_random_state(random_state)
    mesh = mesh or make_docs_mesh()
    n_dev = mesh.shape["docs"]

    dev, doc_starts, n, m = shard_sell(mesh, X)
    # bucketed shard height: padding docs are untouched by every packed entry
    # (owners address real local rows only), so the trajectory is unchanged
    # while similar corpus sizes share the compiled mesh program
    local_docs = sell_ops._bucket_rows(-(-n // n_dev))

    pzd0, pwz0 = plsa_init(X, k, init=init, rng=rng)
    kp = max(k, 1)

    weighted = sample_weight is not None and bool(
        np.any(np.asarray(sample_weight) != 1.0)
    )
    w_src = (np.asarray(sample_weight, np.float32) if weighted
             else np.ones(n, np.float32))
    bounds = np.concatenate([doc_starts, [n]])
    zd = _scatter_doc_sharded(pzd0.astype(np.float32)[:, :kp], bounds, n_dev,
                              local_docs)
    w = _scatter_doc_sharded(w_src, bounds, n_dev, local_docs)

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    zd_s = put(zd, P("docs", None))
    wz_s = put(pwz0.astype(np.float32), P(None, None))
    w_s = put(w, P("docs"))

    run = build_sharded_sparse_fit(mesh, n_iter, n_iter_per_test,
                                   local_docs, m,
                                   e_step_thresh=e_step_thresh)
    zd_f, wz_f, steps, final_ll, trace, n_tests = run(
        dev, zd_s, wz_s, w_s, tolerance
    )
    out = _gather_doc_sharded(np.asarray(zd_f), bounds, n_dev, local_docs, n, k)
    return (out, np.asarray(wz_f)[:k, :m], int(steps),
            np.asarray(trace)[: int(n_tests)])


def sparse_mesh_refit(
    X,
    topics,
    mesh=None,
    n_iter=50,
    n_iter_per_test=10,
    tolerance=0.005,
    e_step_thresh=None,
    random_state=None,
):
    """Frozen-topics refit with the corpus sharded by nonzeros over the mesh
    (the transform path of ``DistributedPLSA(layout="sparse")``)."""
    from sklearn.utils import check_random_state

    rng = check_random_state(random_state)
    mesh = mesh or make_docs_mesh()
    n_dev = mesh.shape["docs"]

    dev, doc_starts, n, m = shard_sell(mesh, X)
    local_docs = sell_ops._bucket_rows(-(-n // n_dev))  # see sparse_mesh_fit
    k = topics.shape[0]

    zd0 = rng.rand(n, k).astype(np.float32)
    zd0 /= zd0.sum(axis=1, keepdims=True)
    bounds = np.concatenate([doc_starts, [n]])
    zd = _scatter_doc_sharded(zd0, bounds, n_dev, local_docs)
    w = _scatter_doc_sharded(np.ones(n, np.float32), bounds, n_dev, local_docs)

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    zd_s = put(zd, P("docs", None))
    wz_s = put(np.asarray(topics, np.float32), P(None, None))
    w_s = put(w, P("docs"))

    run = build_sharded_sparse_fit(mesh, n_iter, n_iter_per_test,
                                   local_docs, m, refit=True,
                                   e_step_thresh=e_step_thresh)
    zd_f = np.asarray(run(dev, zd_s, wz_s, w_s, tolerance)[0])
    return _gather_doc_sharded(zd_f, bounds, n_dev, local_docs, n, k)
