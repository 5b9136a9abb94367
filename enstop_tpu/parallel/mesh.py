"""Mesh-sharded EM: the TPU-native successor of the reference's 2D block-parallel,
dask-distributed, and CUDA variants in one backend.

The reference decomposes the doc-term matrix into an ``n_row_blocks × n_col_blocks``
tile grid, gives each tile its own partial-M output shards, then sum-reduces the
shards and normalizes (block_parallel_plsa.py:116-202).  Its dask variant does the
same with ``dask.delayed`` tile tasks, a ``dstack(...).sum`` reduction graph, and a
``compute()`` gather-to-driver barrier on *every* EM iteration
(distributed_plsa.py:54-133).

Here the tile grid is a ``jax.sharding.Mesh`` with axes ``("docs", "vocab")``:

* ``X``      sharded ``P("docs", "vocab")`` — one dense tile per device, resident;
* ``P(z|d)`` sharded ``P("docs", None)``    — replicated along vocab;
* ``P(w|z)`` sharded ``P(None, "vocab")``   — replicated along docs;
* the per-tile accumulators are ``psum``-reduced along the orthogonal mesh axis
  (replacing block_parallel_plsa.py:182-185 and dask's reduction graph), and the
  convergence test is a scalar psum — factors never leave the devices during the
  whole fit (the gather/re-scatter per iteration in distributed_plsa.py:131 is
  eliminated entirely).

Each device's local tile computation is either the fused Pallas kernel
(``inner="pallas"``) or XLA matmuls (``inner="xla"``) — the same kernels as the
single-chip path, so the mesh backend is a thin collective layer.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import em as em_ops
from ..ops.fit import em_fit_loop

_TINY = 1e-30

__all__ = ["make_mesh", "build_sharded_fit", "shard_inputs", "mesh_layout_multiples"]


def make_mesh(n_row_shards=None, n_col_shards=1, devices=None):
    """Build a 2D ``(docs, vocab)`` device mesh.

    Defaults put all devices on the docs axis (pure data parallelism over
    documents); set ``n_col_shards > 1`` to also shard the vocabulary (the analog
    of the reference's 2D block grid, for large-vocab models).
    """
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_row_shards is None:
        n_row_shards = n_dev // n_col_shards
    if n_row_shards * n_col_shards != n_dev:
        raise ValueError(
            "n_row_shards * n_col_shards = {} does not match device count {}".format(
                n_row_shards * n_col_shards, n_dev
            )
        )
    dev_array = np.asarray(devices).reshape(n_row_shards, n_col_shards)
    return Mesh(dev_array, axis_names=("docs", "vocab"))


def mesh_layout_multiples(mesh, inner="xla"):
    """Padding multiples so every device holds whole tiles of the inner kernel."""
    rd, cd = mesh.shape["docs"], mesh.shape["vocab"]
    if inner == "pallas":
        from ..ops.pallas_em import _DEFAULT_BD, _DEFAULT_BW

        return rd * _DEFAULT_BD, cd * _DEFAULT_BW
    return rd * 8, cd * 128


def _local_accumulators(inner, compute_ll=True, precision="default"):
    # ``precision`` only reaches the fused-kernel inner: the XLA dense ops
    # have no precision knob (same contract as ops/driver._get_steps, whose
    # "xla" backend ignores it too)
    if inner == "pallas":
        from ..ops import pallas_em

        def accum(X, zd, wz, w):
            return pallas_em.em_accumulators_fused(
                X, zd, wz, sample_weight=w, compute_ll=compute_ll,
                precision=precision,
            )

    else:

        def accum(X, zd, wz, w):
            return em_ops.em_accumulators_dense(X, zd, wz, sample_weight=w)

    return accum


@lru_cache(maxsize=64)
def build_sharded_em_step(mesh, inner="xla", weighted=True, compute_ll=True):
    """Return a jittable ``(X, zd, wz, w) -> (next_zd, next_wz, ll)`` over the
    mesh.  With ``compute_ll=False`` the returned scalar is 0 and the pallas
    inner skips the transcendental log sweep (the folded fit loop only needs
    LL on chunk-boundary steps).  Cached per (mesh, inner, weighted,
    compute_ll): remote compiles cost 30s+ here and estimators rebuild their
    programs on every fit/transform."""
    accum = _local_accumulators(inner, compute_ll=compute_ll)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("docs", "vocab"), P("docs", None), P(None, "vocab"), P("docs")),
        out_specs=(P("docs", None), P(None, "vocab"), P()),
        check_vma=False,
    )
    def step(X, zd, wz, w):
        A_l, B_l, ll_l = accum(X, zd, wz, w)
        # Cross-tile shard reduction — the reference's axis-0 sums
        # (block_parallel_plsa.py:182-185) as ICI collectives:
        A = lax.psum(A_l, "docs")        # P(w|z) accumulator: full over local vocab
        B = lax.psum(B_l, "vocab")       # P(z|d) accumulator: full over local docs
        ll = lax.psum(ll_l, ("docs", "vocab"))

        num_wz = wz * A
        # Row norms of P(w|z) span the vocab axis -> one more small psum.
        norm_wz = lax.psum(num_wz.sum(axis=1, keepdims=True), "vocab")
        next_wz = num_wz / jnp.maximum(norm_wz, _TINY)

        num_zd = zd * B
        next_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)
        return next_zd, next_wz, ll

    return step


@lru_cache(maxsize=32)
def build_sharded_ll(mesh, inner="xla", weighted=True):
    if inner == "pallas":
        from ..ops import pallas_em

        local_ll = lambda X, zd, wz, w: pallas_em.log_likelihood_fused(
            X, zd, wz, sample_weight=w
        )
    else:
        local_ll = lambda X, zd, wz, w: em_ops.log_likelihood_dense(
            X, zd, wz, sample_weight=w
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("docs", "vocab"), P("docs", None), P(None, "vocab"), P("docs")),
        out_specs=P(),
        check_vma=False,
    )
    def ll_fn(X, zd, wz, w):
        return lax.psum(local_ll(X, zd, wz, w), ("docs", "vocab"))

    return ll_fn


@lru_cache(maxsize=32)
def build_sharded_refit_step(mesh, inner="xla"):
    """Frozen-topics step over the mesh (for sharded transform/refit)."""
    if inner == "pallas":
        from ..ops import pallas_em

        def local(X, zd, wz):
            b, ll = pallas_em._fused_refit_call(
                X, zd, wz, jnp.ones((X.shape[0], 1), jnp.float32),
                *pallas_em.pick_block_shape(*X.shape),
            )
            return b, ll

    else:

        def local(X, zd, wz):
            Xf = X.astype(jnp.float32)
            S = jnp.dot(zd, wz, preferred_element_type=jnp.float32)
            nz = Xf > 0
            Ssafe = jnp.maximum(S, _TINY)
            R = jnp.where(nz, Xf / Ssafe, 0.0)
            ll = jnp.sum(jnp.where(nz, Xf * jnp.log(Ssafe), 0.0))
            B = jax.lax.dot_general(
                R, wz, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            return B, ll

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("docs", "vocab"), P("docs", None), P(None, "vocab")),
        out_specs=(P("docs", None), P()),
        check_vma=False,
    )
    def step(X, zd, wz):
        B_l, ll_l = local(X, zd, wz)
        B = lax.psum(B_l, "vocab")
        ll = lax.psum(ll_l, ("docs", "vocab"))
        num = zd * B
        next_zd = num / jnp.maximum(num.sum(axis=1, keepdims=True), _TINY)
        return next_zd, ll

    return step


def make_runs_mesh(n_shards=None, devices=None):
    """1D mesh over ensemble bootstrap runs (embarrassing parallelism axis)."""
    devices = devices if devices is not None else jax.devices()
    n_shards = n_shards or len(devices)
    return Mesh(np.asarray(devices[:n_shards]), axis_names=("runs",))


@lru_cache(maxsize=16)
def build_ensemble_runs_sharded(mesh, inner="xla", precision="default"):
    """All bootstrap fits as ONE compiled program: the corpus is replicated, the
    per-run factors/weights are sharded over the ``runs`` axis, and each device
    sweeps its local runs with ``lax.map`` — each element running the full
    on-device EM loop (convergence tests included).

    This replaces the reference's dask/joblib *thread* fan-out over CPU fits
    (enstop_.py:209-229) with SPMD over chips; with one device it still wins by
    removing all host dispatch between runs.
    """
    accum_ll = _local_accumulators(inner, compute_ll=True, precision=precision)
    accum = _local_accumulators(inner, compute_ll=False, precision=precision)
    if inner == "pallas":
        from ..ops import pallas_em

        local_ll = lambda X, zd, wz, w: pallas_em.log_likelihood_fused(
            X, zd, wz, sample_weight=w, precision=precision
        )
    else:
        local_ll = em_ops.log_likelihood_dense

    from ..ops.fit import em_fit_loop_folded

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("runs"), P("runs"), P("runs"), P(), P(), P()),
        out_specs=(P("runs"), P("runs"), P("runs"), P("runs")),
        check_vma=False,
    )
    def run_local(X, zds, wzs, ws, tol, n_iter, npt):
        def one(args):
            zd0, wz0, w = args

            def make_step(acc):
                def step(state):
                    zd, wz = state
                    A, B, ll = acc(X, zd, wz, w)
                    num_wz = wz * A
                    new_wz = num_wz / jnp.maximum(num_wz.sum(1, keepdims=True), _TINY)
                    num_zd = zd * B
                    new_zd = num_zd / jnp.maximum(num_zd.sum(1, keepdims=True), _TINY)
                    return (new_zd, new_wz), ll
                return step

            def ll_of(state):
                return local_ll(X, state[0], state[1], w)

            res = em_fit_loop_folded(make_step(accum_ll), make_step(accum),
                                     ll_of, (zd0, wz0), n_iter, npt, tol)
            return res.state[0], res.state[1], res.final_ll, res.n_steps

        return lax.map(one, (zds, wzs, ws))

    @jax.jit
    def run(X, zds, wzs, ws, tol, n_iter, npt):
        return run_local(X, zds, wzs, ws, tol, n_iter, npt)

    from ..aot_cache import maybe_wrap

    # keep the historical cache key for the default precision so existing
    # AOT disk entries stay valid
    suffix = "" if precision == "default" else f"-{precision}"
    return maybe_wrap(run, name=f"ensruns-{inner}{suffix}")


def shard_factors(mesh, zd, wz, w):
    """Place padded factor/weight host arrays onto the mesh."""
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    return (
        put(zd, P("docs", None)),
        put(wz, P(None, "vocab")),
        put(w, P("docs")),
    )


def shard_inputs(mesh, X, zd, wz, w):
    """Place padded host arrays onto the mesh with the canonical shardings."""
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    return (put(X, P("docs", "vocab")),) + shard_factors(mesh, zd, wz, w)


# pad each tile's nnz to bucket multiples so slightly different corpora reuse
# the compiled per-tile scatter program
_TILE_NNZ_BUCKET = 1 << 14


@lru_cache(maxsize=16)
def _densify_fn(mesh, tr, tc, L, out_bf16):
    """Compiled per-tile scatter program, cached so repeat stagings on the same
    mesh/layout (fit_transform + transform, multiple fits) reuse one remote
    compile — the point of the _TILE_NNZ_BUCKET padding."""
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("docs", "vocab", None),) * 3,
        out_specs=P("docs", "vocab"),
        check_vma=False,
    )
    def densify(lr, lc, lv):
        base = jnp.zeros((tr, tc), out_dtype)
        return base.at[lr[0, 0], lc[0, 0]].add(
            lv[0, 0].astype(out_dtype), indices_are_sorted=True
        )

    return densify


def stage_sharded_counts(mesh, X, inner="xla", x_dtype=np.float32,
                         row_bucket=False):
    """Ship a sparse corpus as per-tile COO nonzeros and densify ON DEVICE
    under ``shard_map`` — the dense padded rectangle never exists on the host
    and never crosses the link (host memory and H2D are O(nnz); the reference
    mesh analog materializes every padded tile host-side,
    block_parallel_plsa.py:373-403).

    Returns ``(Xs, n, m)`` with ``Xs`` sharded ``P("docs", "vocab")`` exactly
    as :func:`shard_inputs` would produce from the dense host path.

    ``row_bucket=True`` pads the doc dimension to the shared coarse buckets
    (``ops/sell.py:_bucket_rows``) so mesh ``transform`` batches of similar
    sizes share ONE compiled sharded refit program (and one densify
    program) instead of recompiling per padded height; the extra rows are
    absorbing zero tiles.
    """
    from scipy.sparse import issparse, csr_matrix

    from ..ops.data import round_up

    if not issparse(X):
        X = csr_matrix(np.asarray(X))
    Xc = X.tocsr()
    Xc.sum_duplicates()
    n, m = Xc.shape
    n_tgt = n
    if row_bucket:
        from ..ops.sell import _bucket_rows

        n_tgt = _bucket_rows(max(n, 1))
    rm, cm = mesh_layout_multiples(mesh, inner)
    n_pad, m_pad = round_up(max(n_tgt, 1), rm), round_up(max(m, 1), cm)
    R, C = mesh.shape["docs"], mesh.shape["vocab"]
    tr, tc = n_pad // R, m_pad // C

    coo = Xc.tocoo()
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    tile = (rows // tr) * C + (cols // tc)
    from ..native import counting_sort_by_key

    # tile keys are tiny ints: the native stable counting sort replaces an
    # O(nnz log nnz) argsort (material at 10M+ nnz on this throttled host)
    order = counting_sort_by_key(tile, R * C)
    if order is None:
        order = np.argsort(tile, kind="stable")  # CSR order within a tile survives
    rows, cols, vals = rows[order], cols[order], coo.data[order]
    tile = tile[order]

    counts = np.bincount(tile, minlength=R * C)
    L = max(round_up(int(counts.max()) if counts.size else 1, _TILE_NNZ_BUCKET),
            _TILE_NNZ_BUCKET)
    # padding lanes: val 0.0 at the tile's last cell — keeps local indices
    # sorted and the add a no-op
    lr = np.full((R * C, L), tr - 1, np.int32)
    lc = np.full((R * C, L), tc - 1, np.int32)
    lv = np.zeros((R * C, L), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    within = np.arange(rows.shape[0], dtype=np.int64) - starts[tile]
    lr[tile, within] = (rows % tr).astype(np.int32)
    lc[tile, within] = (cols % tc).astype(np.int32)
    lv[tile, within] = vals.astype(np.float32)

    put = lambda a: jax.device_put(
        a.reshape(R, C, L), NamedSharding(mesh, P("docs", "vocab", None))
    )
    out_bf16 = str(x_dtype) in ("bfloat16", "bf16") or getattr(
        x_dtype, "__name__", ""
    ) == "bfloat16"
    densify = _densify_fn(mesh, tr, tc, L, bool(out_bf16))
    return densify(put(lr), put(lc), put(lv)), n, m


@lru_cache(maxsize=32)
def _sharded_fit_program(mesh, inner, weighted, refit):
    """The cached jitted fit program for a (mesh, inner, weighted, refit)
    layout.  Iteration counts/tolerance enter as traced arguments, so ONE
    remote compile covers every fit/transform on that layout."""
    from ..ops.fit import em_fit_loop_folded

    em_step_ll = build_sharded_em_step(mesh, inner=inner, weighted=weighted)
    em_step = build_sharded_em_step(mesh, inner=inner, weighted=weighted,
                                    compute_ll=False)
    refit_step = build_sharded_refit_step(mesh, inner=inner)
    ll_fn = build_sharded_ll(mesh, inner=inner, weighted=weighted)

    @jax.jit
    def run_inner(X, zd, wz, w, tol, n_iter_, npt_):
        def ll_of(state):
            return ll_fn(X, state[0], state[1], w)

        if refit:
            # the sharded refit step returns LL of its input state (free fold)
            def step_ll(state):
                new_zd, ll = refit_step(X, state[0], state[1])
                return (new_zd, state[1]), ll

            step = step_ll
        else:
            def step_ll(state):
                new_zd, new_wz, ll = em_step_ll(X, state[0], state[1], w)
                return (new_zd, new_wz), ll

            def step(state):
                new_zd, new_wz, ll = em_step(X, state[0], state[1], w)
                return (new_zd, new_wz), ll

        res = em_fit_loop_folded(step_ll, step, ll_of, (zd, wz),
                                 n_iter_, npt_, tol)
        return (res.state[0], res.state[1], res.n_steps, res.final_ll,
                res.ll_trace, res.n_tests)

    from ..aot_cache import maybe_wrap

    return maybe_wrap(
        run_inner, name=f"meshfit-{inner}-{'refit' if refit else 'em'}"
    )


def build_sharded_fit(mesh, inner, weighted, n_iter, n_iter_per_test, refit=False):
    """Compiled full-fit program over the mesh: EM loop + convergence entirely
    on-device; only the final factors come back to the host.  Iteration counts
    are closed over as traced scalars (no recompile when they change).  The
    convergence log-likelihood is FOLDED into the chunk-boundary step (see
    ops/fit.py:em_fit_loop_folded) — no separate LL sweep over the shards."""
    run_inner = _sharded_fit_program(mesh, inner, bool(weighted), bool(refit))

    def run(X, zd, wz, w, tol):
        return run_inner(X, zd, wz, w, tol, jnp.int32(n_iter), jnp.int32(n_iter_per_test))

    return run
