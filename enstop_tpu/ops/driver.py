"""High-level fit/refit drivers: host-side orchestration around the compiled loops.

Equivalent of the reference's ``plsa_fit`` / ``plsa_refit`` wrappers (plsa.py:643-730,
923-997): initialize factors, lay the data out for the device, run the compiled EM
loop, undo padding.  Unlike the reference's host-driven loops, the entire EM iteration
(including convergence tests) is one compiled program; the host sees only the final
factors (SURVEY.md §3.6: the reference GPU path pays a host round-trip per test).

Backends
--------
``"xla"``     pure-XLA matmul EM (works on CPU and TPU)
``"pallas"``  fused single-pass Pallas TPU kernel (X read once per EM iteration)
``"sparse"``  O(nnz) dual-sorted SELL path (ops/sell.py): memory and compute
              scale with the nonzeros, and ``e_step_thresh`` is honored exactly
``"auto"``    pallas on TPU, xla elsewhere; a materially-firing
              ``e_step_thresh`` (> 1e-30) auto-routes to ``"sparse"``
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.utils import check_random_state

from . import em as em_ops
from .data import pad_dense_counts, pad_factors, pad_vector, unpad_factors
from .fit import em_fit_loop
from .init import plsa_init


def _warn_fast_unsupported(path):
    import warnings

    warnings.warn(
        "precision='fast' (bf16 E-step responsibilities) is a dense Pallas "
        "kernel mode; the {} path runs at default precision".format(path),
        stacklevel=3,
    )

__all__ = ["plsa_fit", "plsa_refit", "resolve_backend"]


def resolve_backend(backend="auto"):
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _nnz_of(X):
    from scipy.sparse import issparse

    return int(X.nnz) if issparse(X) else int(np.count_nonzero(X))


def _get_steps(backend, precision="highest"):
    """Return (em_step, refit_step, ll_fn) for a backend; signatures match
    :func:`enstop_tpu.ops.em.em_step_dense` etc."""
    if backend == "xla":
        return (
            em_ops.em_step_dense,
            em_ops.refit_step_dense,
            em_ops.log_likelihood_dense,
            em_ops.em_step_dense,  # already returns LL of the input state
        )
    if backend == "pallas":
        from . import pallas_em

        # The loop only consults LL at test points; at those points the test
        # value is FOLDED into the step kernel (compute_ll=True on the
        # boundary step — see em_fit_loop_folded), so the per-iteration step
        # skips the transcendental log sweep and no separate LL pass runs.
        def em(X, zd, wz, sample_weight=None):
            return pallas_em.em_step_fused(
                X, zd, wz, sample_weight=sample_weight,
                compute_ll=False, precision=precision,
            )

        def em_ll(X, zd, wz, sample_weight=None):
            return pallas_em.em_step_fused(
                X, zd, wz, sample_weight=sample_weight,
                compute_ll=True, precision=precision,
            )

        def refit(X, zd, wz, sample_weight=None):
            return pallas_em.refit_step_fused(
                X, zd, wz, sample_weight=sample_weight,
                compute_ll=False, precision=precision,
            )

        def ll(X, zd, wz, sample_weight=None):
            return pallas_em.log_likelihood_fused(
                X, zd, wz, sample_weight=sample_weight, precision=precision
            )

        return em, refit, ll, em_ll
    raise ValueError("Unrecognized backend {!r}".format(backend))


@lru_cache(maxsize=64)
def _build_fit_fn_cached(backend, weighted, refit, precision="highest"):
    """One compiled loop program per (backend, refit, precision): iteration
    counts and tolerance are traced scalars, and unweighted fits pass all-ones
    weights (bit-identical math), so neither changing n_iter/n_iter_per_test/
    tolerance nor toggling sample weights recompiles (the loop program contains
    the Pallas kernels — its compile is expensive, especially under remote
    compilation)."""
    del weighted  # unified: w == ones reproduces the unweighted math exactly
    from .fit import em_fit_loop_folded

    em_step, refit_step, ll_fn, em_step_ll = _get_steps(backend, precision)

    @jax.jit
    def run(X, zd, wz, w, tol, n_iter, n_iter_per_test):
        sw = w

        def ll_of(state):
            return ll_fn(X, state[0], state[1], sample_weight=sw)

        if refit:
            def step(state):
                new_zd, ll = refit_step(X, state[0], state[1], sample_weight=sw)
                return (new_zd, state[1]), ll

            res = em_fit_loop(step, ll_of, (zd, wz), n_iter, n_iter_per_test, tol)
        else:
            def step(state):
                new_zd, new_wz, ll = em_step(X, state[0], state[1], sample_weight=sw)
                return (new_zd, new_wz), ll

            def step_ll(state):
                new_zd, new_wz, ll = em_step_ll(X, state[0], state[1], sample_weight=sw)
                return (new_zd, new_wz), ll

            res = em_fit_loop_folded(step_ll, step, ll_of, (zd, wz),
                                     n_iter, n_iter_per_test, tol)
        return res.state[0], res.state[1], res.n_steps, res.final_ll, res.ll_trace, res.n_tests

    from ..aot_cache import maybe_wrap

    return maybe_wrap(run, name=f"fit-{backend}-{'refit' if refit else 'em'}")


def _build_fit_fn(backend, n_iter, n_iter_per_test, weighted, refit, precision="highest"):
    del weighted  # see _build_fit_fn_cached: one unified weighted program
    inner = _build_fit_fn_cached(backend, False, refit, precision)

    def run(X, zd, wz, w, tol):
        return inner(
            X, zd, wz, w, tol, jnp.int32(n_iter), jnp.int32(n_iter_per_test)
        )[:4]

    def run_full(X, zd, wz, w, tol):
        return inner(
            X, zd, wz, w, tol, jnp.int32(n_iter), jnp.int32(n_iter_per_test)
        )

    run.full = run_full
    return run


def _layout_multiples(backend, n, m):
    if backend == "pallas":
        from .pallas_em import pick_block_shape

        bd, bw = pick_block_shape(n, m)
        return bd, bw
    return 8, 128


# Device-densify staging: pad the COO nnz to bucket multiples so repeated
# prepares (warmup fits, bootstrap ensembles, slightly-grown corpora) reuse
# one compiled scatter program instead of recompiling per exact nnz.
_DENSIFY_NNZ_BUCKET = 1 << 16


@lru_cache(maxsize=16)
def _device_densify_fn(n_pad, m_pad, out_bf16):
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32

    @jax.jit
    def densify(rows, cols, vals):
        base = jnp.zeros((n_pad, m_pad), out_dtype)
        # CSR-ordered entries with end-padding keep the indices sorted;
        # padding lanes carry val 0.0 (add is a no-op wherever they land),
        # bf16 adds are exact: each real (row, col) is unique post
        # sum_duplicates and bf16 eligibility guarantees representable counts
        return base.at[rows, cols].add(
            vals.astype(out_dtype), indices_are_sorted=True
        )

    from ..aot_cache import maybe_wrap

    return maybe_wrap(densify, name=f"densify-{n_pad}x{m_pad}")


def _stage_dense_via_device(X, n_pad, m_pad, n, m, x_dtype):
    """Ship the corpus as COO (O(nnz) bytes) and densify on device with one
    scatter program — the padded-dense H2D transfer is the staging bottleneck
    on thin links (20NG: 0.97 GB bf16 dense vs ~30 MB of nonzeros)."""
    from .data import round_up

    Xc = X.tocsr()
    Xc.sum_duplicates()
    coo = Xc.tocoo()
    nnz = int(coo.nnz)
    nnz_pad = max(round_up(max(nnz, 1), _DENSIFY_NNZ_BUCKET), _DENSIFY_NNZ_BUCKET)
    rows = np.full(nnz_pad, min(n, n_pad - 1), np.int32)
    cols = np.full(nnz_pad, m_pad - 1, np.int32)
    vals = np.zeros(nnz_pad, np.float32)
    rows[:nnz] = coo.row
    cols[:nnz] = coo.col
    vals[:nnz] = coo.data
    fn = _device_densify_fn(n_pad, m_pad, bool(_is_bf16(x_dtype)))
    return fn(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals))


def _device_densify_worthwhile(X, n_pad, m_pad, x_dtype):
    """Stage via device scatter when the COO bytes are well under the dense
    bytes (x8 margin: the scatter program costs a compile + a device pass)."""
    from scipy.sparse import issparse

    if not issparse(X):
        return False
    dense_bytes = n_pad * m_pad * (2 if _is_bf16(x_dtype) else 4)
    coo_bytes = (X.nnz + _DENSIFY_NNZ_BUCKET) * 12
    return coo_bytes * 8 < dense_bytes


def _stage_dense(X, backend, x_dtype, stage="auto", row_bucket=False):
    """Densify + pad + ship once.  ``stage="auto"`` ships sparse corpora as
    COO nonzeros and densifies ON DEVICE (O(nnz) H2D instead of the full
    rectangle); ``"host"`` forces the native host densify + dense transfer;
    ``"device"`` forces the scatter path.

    ``row_bucket=True`` pads rows to the shared coarse buckets
    (``ops/sell.py:_bucket_rows``, <=~6% absorbing zero rows) so
    similar-sized inputs share one compiled program — used by the refit
    (serving ``transform``) path, where batch sizes vary request-to-request
    and every distinct padded shape costs a fresh compile.  The fit path
    keeps exact tile-multiple padding (one corpus, headline throughput)."""
    from scipy.sparse import issparse

    from .data import round_up

    n, m = X.shape
    n_tgt = n
    if row_bucket:
        from .sell import _bucket_rows

        n_tgt = _bucket_rows(max(n, 1))
    # layout multiples from the BUCKETED height: the pallas tile height is
    # n-derived below 512 rows, so deriving it from the raw batch size would
    # re-fragment small serving batches onto per-size programs
    rm, cm = _layout_multiples(backend, n_tgt, m)
    # the ONE padded-shape computation — every staging branch below must use
    # these, or the paths drift onto different compiled shapes
    n_pad = round_up(max(n_tgt, 1), rm)
    m_pad = round_up(max(m, 1), cm)
    if stage != "host" and issparse(X):
        if stage == "device" or _device_densify_worthwhile(X, n_pad, m_pad, x_dtype):
            return (
                _stage_dense_via_device(X, n_pad, m_pad, n, m, x_dtype), n, m
            )
    if _is_bf16(x_dtype) and issparse(X):
        import ml_dtypes

        from ..native import densify_csr_rows_bf16

        out = np.zeros((n_pad, m_pad), np.uint16)
        densify_csr_rows_bf16(X.tocsr(), 0, n, out)
        return jax.device_put(out.view(ml_dtypes.bfloat16)), n, m
    Xd, n, m = pad_dense_counts(X, row_multiple=rm, col_multiple=cm,
                                dtype=np.float32, min_rows=n_tgt)
    assert Xd.shape == (n_pad, m_pad)  # host path must match the other branches
    if _is_bf16(x_dtype):
        import ml_dtypes

        Xd = Xd.astype(ml_dtypes.bfloat16)
    return jax.device_put(Xd), n, m


class PreparedCounts:
    """A device-resident, padded count matrix reusable across fits.

    Repeated fits on the same corpus (warm starts, ensembles, hyperparameter
    sweeps) should not pay densify + host->device transfer per fit; prepare the
    data once with :func:`prepare_counts` and pass the result anywhere a count
    matrix is accepted.
    """

    __slots__ = ("device_array", "n", "m", "nnz", "backend")

    def __init__(self, device_array, n, m, nnz, backend):
        self.device_array = device_array
        self.n = n
        self.m = m
        self.nnz = nnz
        self.backend = backend

    @property
    def shape(self):
        return (self.n, self.m)


def _is_bf16(x_dtype):
    return x_dtype in ("bfloat16", jnp.bfloat16) or (
        hasattr(x_dtype, "name") and getattr(x_dtype, "name", "") == "bfloat16"
    )


def _resolve_x_dtype(X, x_dtype, will_standardize=True):
    """``"auto"`` -> bf16 exactly when it is lossless (integer-valued counts
    with max <= 256 — every such value is representable in bf16), halving the
    per-iteration HBM stream; otherwise f32."""
    if x_dtype != "auto":
        return x_dtype
    from scipy.sparse import issparse

    vals = X.data if issparse(X) else np.asarray(X).ravel()
    if vals.size == 0:
        return np.float32
    if np.issubdtype(vals.dtype, np.integer):
        return "bfloat16" if vals.max() <= 256 else np.float32
    if np.issubdtype(vals.dtype, np.floating) and not will_standardize:
        # float-typed but integral-valued counts (e.g. after a float32 cast,
        # as the reference ensemble does, enstop_.py:527) are bf16-exact
        # when <= 256 — valid only when no l1-normalization follows.
        if vals.size <= 50_000_000 and np.all(vals == np.round(vals)):
            return "bfloat16" if vals.max() <= 256 else np.float32
    return np.float32


def prepare_counts(X, backend="auto", x_dtype="auto", standardize=True,
                   stage="auto", row_bucket=False):
    """Densify, pad, and ship a count matrix to the device once.

    ``x_dtype``: ``"auto"`` (default) stores the device copy in bf16 exactly
    when that is lossless (integer counts <= 256), halving the per-iteration
    HBM stream with bit-identical results; ``"bfloat16"`` forces bf16 (larger
    counts / normalized floats round to 8 mantissa bits — fine for topic
    quality, not for strict LL parity); any float dtype forces f32.

    ``stage``: ``"auto"`` (default) ships sparse corpora as O(nnz) COO bytes
    and densifies on device (the full-rectangle H2D is the staging bottleneck);
    ``"host"``/``"device"`` force a path.

    ``row_bucket=True`` pads rows to coarse shared buckets (<=~6% absorbing
    zero rows) so repeated fits on similar-sized corpora — sliding windows,
    per-tenant shards — share one compiled fit program instead of one per
    exact padded height.  The padding is mathematically absorbing; fits
    agree to f32 summation-order rounding (ULP-level — the P(w|z)
    accumulator's row reduction tree changes with padded length), while
    refits are bit-identical (row-local updates).  The small rectangle
    growth costs proportionally per iteration, hence opt-in for fits
    (``transform``/refit staging buckets unconditionally).
    """
    from ..utils import standardize_input

    backend = resolve_backend(backend)
    x_dtype = _resolve_x_dtype(X, x_dtype, will_standardize=standardize)
    if standardize:
        # float inputs are l1-row-normalized, like the estimator entry points
        # (reference plsa.py:1139, utils.py:276-280); the ensemble pipeline
        # instead fits raw float32 counts (enstop_.py:527) and passes
        # standardize=False.
        X = standardize_input(X)
    dev, n, m = _stage_dense(X, backend, x_dtype, stage=stage,
                             row_bucket=row_bucket)
    return PreparedCounts(dev, n, m, _nnz_of(X), backend)


def plsa_fit(
    X,
    k,
    sample_weight=None,
    init="random",
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=1e-32,
    random_state=None,
    backend="auto",
    x_dtype="auto",
    precision="default",
    return_info=False,
):
    """Fit pLSA factors ``(P(z|d), P(w|z))`` to a (sparse or dense) count matrix.

    Mirrors the reference driver (plsa.py:643-730).  ``e_step_thresh``: the
    default 1e-32 never fires in f32 and the matmul-form kernels skip the
    cutoff; a materially-firing threshold (> 1e-30, e.g. the ensemble's 1e-16)
    routes ``backend="auto"`` to the sparse backend, which applies the
    reference's exact semantics (plsa.py:97-102).

    ``precision``: MXU matmul precision for the Pallas backend. ``"default"``
    (bf16 multiplies, f32 accumulation) converges to the same optimum as
    ``"highest"`` (true f32, 6-pass) — measured final log-likelihood difference
    4e-5 relative over a full 100-iteration 20NG-scale fit — at ~2x the step
    throughput.  Use ``"highest"`` for strict numerical parity runs.
    ``"fast"`` additionally computes the per-entry responsibilities ratio in
    bf16 (the jo_res_bf16r kernel layout — measured 20%/20%/12% faster
    per iteration at k=20/100/200 on v5e, logs/tpu_queue_r5/tpu_q5_kernel_v3.log):
    the factors are no longer bit-comparable to the exact kernels, but the
    EM optimum reached is statistically equivalent (tests/test_fast_precision.py
    pins convergence bands).  Falls back to ``"default"`` when the resident
    accumulator exceeds VMEM (very large corpora) and on non-Pallas backends;
    the sparse (SELL) path warns when it drops the mode.
    """
    rng = check_random_state(random_state)

    from .sell import PreparedSell, THRESH_MATERIAL

    if backend == "auto" and not isinstance(X, (PreparedCounts, PreparedSell)):
        if e_step_thresh is not None and e_step_thresh > THRESH_MATERIAL:
            backend = "sparse"  # the only path with exact thresh semantics

    if isinstance(X, PreparedSell) or backend == "sparse":
        if precision == "fast":
            _warn_fast_unsupported("sparse (SELL)")
        return _plsa_fit_sparse(
            X, k, sample_weight=sample_weight, init=init, n_iter=n_iter,
            n_iter_per_test=n_iter_per_test, tolerance=tolerance,
            e_step_thresh=e_step_thresh, rng=rng, return_info=return_info,
        )

    if isinstance(X, PreparedCounts):
        backend = X.backend
        Xd, n, m, nnz = X.device_array, X.n, X.m, X.nnz
        if init not in ("random",) and not isinstance(init, (tuple, list)):
            raise ValueError(
                "PreparedCounts supports init='random' or an explicit factor "
                "tuple; data-dependent inits need the raw matrix"
            )
        p_z_given_d, p_w_given_z = plsa_init(X, k, init=init, rng=rng)
    else:
        backend = resolve_backend(backend)
        x_dtype = _resolve_x_dtype(X, x_dtype)
        p_z_given_d, p_w_given_z = plsa_init(X, k, init=init, rng=rng)
        Xd, n, m = _stage_dense(X, backend, x_dtype)
        nnz = _nnz_of(X)

    zd, wz = pad_factors(p_z_given_d, p_w_given_z, Xd.shape[0], Xd.shape[1])

    weighted = sample_weight is not None and bool(np.any(np.asarray(sample_weight) != 1.0))
    w = pad_vector(
        np.asarray(sample_weight, dtype=np.float32) if weighted else np.ones(n, np.float32),
        Xd.shape[0],
    )

    import time as _time

    run = _build_fit_fn(backend, int(n_iter), int(n_iter_per_test), weighted, False, precision)
    t0 = _time.perf_counter()
    zd_f, wz_f, steps, final_ll, ll_trace, n_tests = run.full(
        Xd, zd, wz, w, jnp.float32(tolerance)
    )
    zd_f, wz_f = np.asarray(zd_f), np.asarray(wz_f)  # sync
    wall = _time.perf_counter() - t0
    zd_out, wz_out = unpad_factors(zd_f, wz_f, n, m, k)
    if return_info:
        steps = int(steps)
        return zd_out, wz_out, {
            "n_steps": steps,
            "log_likelihood": float(final_ll),
            "ll_trace": np.asarray(ll_trace)[: int(n_tests)],
            "wall_time_s": wall,
            "nnz_k_updates_per_s": steps * nnz * k / max(wall, 1e-9),
        }
    return zd_out, wz_out


def _plsa_fit_sparse(
    X, k, sample_weight, init, n_iter, n_iter_per_test, tolerance,
    e_step_thresh, rng, return_info,
):
    """Sparse-backend fit: O(nnz) memory/compute, exact e_step_thresh."""
    import time as _time

    from .sell import PreparedSell, prepare_sell, sell_fit

    # standardization is the estimator layer's job (validate_corpus), matching
    # the dense backends which pad the matrix as-given
    prep = X if isinstance(X, PreparedSell) else prepare_sell(X, standardize=False)
    if isinstance(X, PreparedSell) and init not in ("random",) and not isinstance(
        init, (tuple, list)
    ):
        raise ValueError(
            "PreparedSell supports init='random' or an explicit factor tuple; "
            "data-dependent inits need the raw matrix"
        )
    p_z_given_d, p_w_given_z = plsa_init(
        X if not isinstance(X, PreparedSell) else prep, k, init=init, rng=rng
    )
    weighted = sample_weight is not None and bool(
        np.any(np.asarray(sample_weight) != 1.0)
    )
    t0 = _time.perf_counter()
    zd_f, wz_f, steps, final_ll, ll_trace, n_tests = sell_fit(
        prep, p_z_given_d, p_w_given_z,
        sample_weight=np.asarray(sample_weight, np.float32) if weighted else None,
        n_iter=n_iter, n_iter_per_test=n_iter_per_test, tolerance=tolerance,
        e_step_thresh=e_step_thresh,
    )
    zd_out, wz_out = np.asarray(zd_f), np.asarray(wz_f)  # sync
    wall = _time.perf_counter() - t0
    if return_info:
        steps = int(steps)
        return zd_out, wz_out, {
            "n_steps": steps,
            "log_likelihood": float(final_ll),
            "ll_trace": np.asarray(ll_trace)[: int(n_tests)],
            "wall_time_s": wall,
            "nnz_k_updates_per_s": steps * prep.nnz * k / max(wall, 1e-9),
        }
    return zd_out, wz_out


def plsa_refit(
    X,
    topics,
    sample_weight=None,
    n_iter=50,
    n_iter_per_test=10,
    tolerance=0.005,
    e_step_thresh=1e-32,
    random_state=None,
    backend="auto",
    x_dtype="auto",
    precision="default",
):
    """Fit only ``P(z|d)`` against frozen ``topics`` (reference plsa.py:923-997).

    Note: the reference's refit convergence test is gated on a positive
    log-likelihood (plsa.py:913) which never holds, so it always runs all
    ``n_iter`` iterations; here the relative-tolerance test actually works, which
    can only stop earlier at equivalent quality.
    """
    rng = check_random_state(random_state)
    k = topics.shape[0]

    from .sell import PreparedSell, THRESH_MATERIAL

    if backend == "auto" and not isinstance(X, (PreparedCounts, PreparedSell)):
        if e_step_thresh is not None and e_step_thresh > THRESH_MATERIAL:
            backend = "sparse"

    p_z_given_d = rng.rand(X.shape[0], k)
    p_z_given_d /= p_z_given_d.sum(axis=1, keepdims=True)
    p_z_given_d = p_z_given_d.astype(np.float32)

    if isinstance(X, PreparedSell) or backend == "sparse":
        if precision == "fast":
            _warn_fast_unsupported("sparse (SELL) refit")
        from .sell import prepare_sell, sell_refit

        prep = X if isinstance(X, PreparedSell) else prepare_sell(X, standardize=False)
        weighted = sample_weight is not None and bool(
            np.any(np.asarray(sample_weight) != 1.0)
        )
        zd_f = sell_refit(
            prep, p_z_given_d, np.asarray(topics, np.float32),
            sample_weight=np.asarray(sample_weight, np.float32) if weighted else None,
            n_iter=n_iter, n_iter_per_test=n_iter_per_test, tolerance=tolerance,
            e_step_thresh=e_step_thresh,
        )[0]
        return np.asarray(zd_f)

    if isinstance(X, PreparedCounts):
        backend = X.backend
        Xd, n, m = X.device_array, X.n, X.m
    else:
        backend = resolve_backend(backend)
        x_dtype = _resolve_x_dtype(X, x_dtype)
        # serving path: bucket the row padding so transform batches of
        # similar (or zero-row-stripped) sizes share ONE compiled refit
        # program instead of one per distinct padded height
        Xd, n, m = _stage_dense(X, backend, x_dtype, row_bucket=True)
    zd, wz = pad_factors(p_z_given_d, np.asarray(topics, dtype=np.float32), Xd.shape[0], Xd.shape[1])

    weighted = sample_weight is not None and bool(np.any(np.asarray(sample_weight) != 1.0))
    w = pad_vector(
        np.asarray(sample_weight, dtype=np.float32) if weighted else np.ones(n, np.float32),
        Xd.shape[0],
    )

    run = _build_fit_fn(backend, int(n_iter), int(n_iter_per_test), weighted, True, precision)
    zd_f, _, _, _ = run(Xd, zd, wz, w, jnp.float32(tolerance))
    return np.asarray(zd_f)[:n, :k]
