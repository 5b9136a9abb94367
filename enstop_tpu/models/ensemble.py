"""Ensemble topic modeling (EnsTop) — the flagship capability.

Pipeline (reference enstop_.py:417-584): bootstrap-resample documents, fit k topics
per run (pLSA or NMF), stack all ``n_runs · k`` topic vectors, cluster them to find
stable topics (Hellinger/UMAP + HDBSCAN), merge each cluster (membership-weighted
square-of-mean-of-sqrt), and refit document vectors against the stable topics.

TPU-native re-design of the runs:

* The reference fans bootstrap fits out over dask/joblib *threads* on the CPU
  (enstop_.py:209-229); here every fit is already an entire compiled on-device EM
  program, so runs execute back-to-back on the accelerator against a single
  device-resident copy of the padded data matrix.  Bootstrapping is expressed as
  *multinomial document weights* (each doc appears ``Multinomial(n, 1/n)`` times
  — exactly the row-multiset the reference materializes with
  ``rng.randint(0, n, n)`` row gathers, enstop_.py:87-88) so no per-run data copy
  or re-upload ever happens; ``parallelism="resample"`` reproduces the
  reference's materialized row-resample instead.
* Topic-distance matrices are MXU matmuls (cluster/distances.py); UMAP + HDBSCAN
  run host-side on the tiny (n_runs·k, n_words) stack with first-class
  reimplementations (cluster/umap.py, cluster/hdbscan.py — this environment has
  no hdbscan/umap packages).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy.sparse import coo_matrix, csr_matrix, issparse
from sklearn.utils import check_array, check_random_state

import jax
import jax.numpy as jnp

from ..cluster.distances import all_pairs_hellinger_distance, all_pairs_kl_divergence
from ..cluster.hdbscan import (
    HDBSCAN,
    compute_stability,
    condense_tree,
    labels_and_probabilities,
    mst_linkage,
    select_clusters,
    single_linkage_tree,
)
from ..cluster.umap import umap_embed
from ..ops.driver import plsa_fit, plsa_refit, resolve_backend, _build_fit_fn
from ..ops.data import pad_factors, pad_vector
from ..ops.init import plsa_init
from ..utils import _check_sample_weight, normalized
from .base import TopicModelBase


# ---------------------------------------------------------------------------
# bootstrap topic workers (reference enstop_.py:56-161)
# ---------------------------------------------------------------------------

def plsa_topics(X, k, **kwargs):
    """One bootstrap-resampled pLSA run; returns the (k, n_words) topics
    (reference enstop_.py:56-115)."""
    A = X.tocsr()
    if kwargs.get("bootstrap", True):
        rng = check_random_state(kwargs.get("random_state", None))
        bootstrap_sample_indices = rng.randint(0, A.shape[0], size=A.shape[0])
        B = A[bootstrap_sample_indices]
    else:
        B = A
    sample_weight = _check_sample_weight(None, B, dtype=np.float32)
    _, topics = plsa_fit(
        B,
        k,
        sample_weight=sample_weight,
        init=kwargs.get("init", "random"),
        n_iter=kwargs.get("n_iter", 100),
        n_iter_per_test=kwargs.get("n_iter_per_test", 10),
        tolerance=kwargs.get("tolerance", 0.001),
        e_step_thresh=kwargs.get("e_step_thresh", 1e-16),
        random_state=kwargs.get("random_state", None),
        backend=kwargs.get("backend", "auto"),
        precision=kwargs.get("precision", "default"),
    )
    return topics


def nmf_topics(X, k, **kwargs):
    """One bootstrap-resampled NMF run, topics l1-normalized
    (reference enstop_.py:118-161; solver="mu" uses the TPU-native MU solver,
    solver="cd" falls back to sklearn's coordinate descent).

    ``alpha`` follows the reference's (pre-1.0 sklearn) semantics: one unscaled
    L2 constant regularizing both factors.  Modern sklearn scales ``alpha_W`` by
    ``n_features`` and ``alpha_H`` by ``n_samples``, so the cd fallback divides
    accordingly to reproduce the reference's objective."""
    A = X.tocsr()
    if kwargs.get("bootstrap", True):
        rng = check_random_state(kwargs.get("random_state", None))
        bootstrap_sample_indices = rng.randint(0, A.shape[0], size=A.shape[0])
        B = A[bootstrap_sample_indices]
    else:
        B = A
    solver = kwargs.get("solver", "mu")
    alpha = float(kwargs.get("alpha", 0.0))
    if solver == "cd":
        from sklearn.decomposition import NMF

        nmf = NMF(
            n_components=k,
            init=kwargs.get("init", "nndsvd"),
            beta_loss=2,
            solver="cd",
            alpha_W=alpha / B.shape[1],
            alpha_H=alpha / B.shape[0],
            l1_ratio=0.0,
            random_state=kwargs.get("random_state", None),
        ).fit(B)
        topics = nmf.components_.copy()
    else:
        from ..ops.nmf import nmf_fit_mu

        _, topics = nmf_fit_mu(
            B,
            k,
            beta_loss=kwargs.get("beta_loss", 1),
            init=kwargs.get("init", "nndsvd") if not isinstance(kwargs.get("init"), (tuple, list)) else "nndsvd",
            alpha=alpha,
            random_state=kwargs.get("random_state", None),
        )
    return normalized(np.asarray(topics, dtype=np.float64), axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# ensemble fan-out (reference enstop_.py:164-231, redesigned device-resident)
# ---------------------------------------------------------------------------

def _n_devices():
    try:
        return len(jax.devices())
    except Exception:
        return 1


def resolve_parallelism(parallelism, model="plsa", backend="auto",
                        n_runs=16, prepared=None):
    """Topology-aware fan-out routing (VERDICT r04 item 4).

    ``"auto"`` (the estimator default) picks the measured-best mode for the
    current topology: ``"weights"`` on a single device — the one-program
    sharded SPMD fan-out is measured ~2x slower there (docs/PERFORMANCE.md:
    11.1 s vs 4.7-6.8 s E2E) — and ``"sharded"`` when the runs can divide
    across >1 device.  Sparse (SELL) corpora always route to ``"weights"``:
    the O(nnz) resident fan-out is the sparse program, there is no sharded
    SELL variant.  Explicit strings are honored unchanged, with a warning
    when the user forces the measured-slower mode on one chip.
    """
    from ..ops.sell import PreparedSell

    sparse_input = backend == "sparse" or isinstance(prepared, PreparedSell)
    if parallelism == "auto":
        if model != "plsa":
            return "resample"
        if sparse_input:
            return "weights"
        # "sharded" only when the runs genuinely divide across >1 device:
        # mirror _sharded_plsa_runs' shard count (largest divisor of n_runs
        # <= n_devices) so e.g. 5 runs on 2 devices — where the SPMD program
        # would degenerate to the measured-slower 1-shard mode — route to
        # "weights" instead
        n_shards = min(_n_devices(), int(n_runs)) if n_runs else 1
        while n_shards > 1 and n_runs % n_shards:
            n_shards -= 1
        return "sharded" if n_shards > 1 else "weights"
    if parallelism == "sharded" and model == "plsa" and sparse_input:
        raise ValueError(
            "parallelism='sharded' has no sparse (SELL) variant — the O(nnz) "
            "resident fan-out IS the sparse program; use parallelism='weights' "
            "or 'auto' with backend='sparse'"
        )
    if parallelism == "sharded" and model == "plsa" and _n_devices() == 1:
        import warnings

        warnings.warn(
            "parallelism='sharded' on a single device is measured ~2x "
            "slower than 'weights' (it exists for multi-chip fan-out); "
            "use parallelism='auto' to route by topology",
            stacklevel=3,
        )
    return parallelism


@lru_cache(maxsize=32)
def _dense_init_fn(n_pad, kp, n, k, m_pad, m):
    """Compiled on-device random-init generator, cached so repeat ensemble fits
    at the same shape reuse one compile (remote compiles cost 30s+ here)."""

    @jax.jit
    def make_init(key):
        kz, kw = jax.random.split(key)
        zd = jax.random.uniform(kz, (n_pad, kp), jnp.float32)
        zd = jnp.where((jnp.arange(n_pad) < n)[:, None]
                       & (jnp.arange(kp) < k)[None, :], zd, 0.0)
        zd = zd / jnp.maximum(zd.sum(1, keepdims=True), 1e-30)
        wz = jax.random.uniform(kw, (kp, m_pad), jnp.float32)
        wz = jnp.where((jnp.arange(kp) < k)[:, None]
                       & (jnp.arange(m_pad) < m)[None, :], wz, 0.0)
        wz = wz / jnp.maximum(wz.sum(1, keepdims=True), 1e-30)
        return zd, wz

    return make_init


@lru_cache(maxsize=16)
def _sharded_inits_fn(mesh, n_pad, kp, n, k, m_pad, m, n_runs):
    """Compiled runs-sharded random-init generator (cached like _dense_init_fn)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    runs_spec = NamedSharding(mesh, P("runs"))

    def make_inits(key):
        def one(kk):
            kz, kw = jax.random.split(kk)
            zd = jax.random.uniform(kz, (n_pad, kp), jnp.float32)
            zd = jnp.where((jnp.arange(n_pad) < n)[:, None]
                           & (jnp.arange(kp) < k)[None, :], zd, 0.0)
            zd = zd / jnp.maximum(zd.sum(1, keepdims=True), 1e-30)
            wz = jax.random.uniform(kw, (kp, m_pad), jnp.float32)
            wz = jnp.where((jnp.arange(kp) < k)[:, None]
                           & (jnp.arange(m_pad) < m)[None, :], wz, 0.0)
            wz = wz / jnp.maximum(wz.sum(1, keepdims=True), 1e-30)
            return zd, wz

        return jax.vmap(one)(jax.random.split(key, n_runs))

    return jax.jit(make_inits, out_shardings=(runs_spec, runs_spec))


def _device_resident_plsa_runs(X, k, n_runs, rng, bootstrap=True, init="random",
                               n_iter=100, n_iter_per_test=10, tolerance=0.001,
                               backend="auto", precision="default", x_dtype="auto",
                               prepared=None):
    """Run ``n_runs`` bootstrap pLSA fits against ONE device-resident copy of X
    (dense-padded or sparse SELL), expressing each bootstrap as multinomial
    document weights."""
    from ..ops.driver import prepare_counts
    from ..ops.sell import PreparedSell, prepare_sell

    if prepared is None:
        if backend == "sparse":
            prepared = prepare_sell(X, standardize=False)
        else:
            prepared = prepare_counts(X, backend=backend, x_dtype=x_dtype,
                                      standardize=False)
    if isinstance(prepared, PreparedSell):
        if precision == "fast":
            from ..ops.driver import _warn_fast_unsupported

            _warn_fast_unsupported("sparse (SELL) ensemble fan-out")
        return _sparse_resident_plsa_runs(
            X, k, n_runs, rng, prepared, bootstrap=bootstrap, init=init,
            n_iter=n_iter, n_iter_per_test=n_iter_per_test, tolerance=tolerance,
        )
    backend = prepared.backend
    Xdev, n, m = prepared.device_array, prepared.n, prepared.m

    run = _build_fit_fn(backend, int(n_iter), int(n_iter_per_test), True, False, precision)

    n_pad, m_pad = Xdev.shape
    # init from the raw matrix (data-dependent inits like "nndsvd" need it);
    # only shapes are used for init="random"
    init_source = prepared if X is None else X
    uniform = np.full(n, 1.0 / n)
    tol = jnp.float32(tolerance)

    # init="random" factors are generated ON DEVICE (jax PRNG): per-run l1-
    # normalized uniforms with absorbing zero padding — no 3.5 MB/run
    # host->device init transfer (material on slow links; the values are a
    # different-but-equivalent random stream than plsa_init's numpy one)
    make_init = None
    if init == "random":
        from ..ops.data import round_up

        kp = round_up(k, 8)
        base_key = jax.random.PRNGKey(int(rng.randint(np.iinfo(np.int32).max)))
        make_init = _dense_init_fn(n_pad, kp, n, k, m_pad, m)

    # Dispatch every run before syncing any: JAX async dispatch queues the 16
    # fit programs back-to-back on the device while the host generates the
    # next run's bootstrap weights — the device never idles on host work or
    # result transfers between runs.
    pending = []
    for i in range(n_runs):
        if make_init is not None:
            zd, wz = make_init(jax.random.fold_in(base_key, i))
        else:
            pzd0, pwz0 = plsa_init(init_source, k, init=init, rng=rng)
            zd, wz = pad_factors(pzd0, pwz0, n_pad, m_pad)
        if bootstrap:
            counts = rng.multinomial(n, uniform).astype(np.float32)
        else:
            counts = np.ones(n, np.float32)
        w = pad_vector(counts, n_pad)
        _, wz_f, _, _ = run(Xdev, zd, wz, w, tol)
        pending.append(wz_f)
    # the (n_runs·k, m) stack stays ON DEVICE: the combiner's distance matrix
    # and merge are device matmuls, so only small matrices ever come back
    return jnp.concatenate([wz_f[:k, :m] for wz_f in pending], axis=0)


def _sparse_resident_plsa_runs(X, k, n_runs, rng, prepared, bootstrap=True,
                               init="random", n_iter=100, n_iter_per_test=10,
                               tolerance=0.001):
    """Bootstrap fan-out on the O(nnz) resident layout (for corpora whose dense
    rectangle would not fit in HBM); multinomial-weight bootstraps, pipelined
    dispatch like the dense path."""
    from ..ops.sell import sell_fit

    n, m = prepared.n, prepared.m
    init_source = prepared if X is None else X
    uniform = np.full(n, 1.0 / n)

    # init="random" factors generated on device (same rationale as the dense
    # fan-out: at sparse-path scales the per-run factor pairs are tens of MB
    # of pure H2D)
    make_init = None
    if init == "random":
        base_key = jax.random.PRNGKey(int(rng.randint(np.iinfo(np.int32).max)))
        # unpadded layout: n_pad == n, kp == k, m_pad == m
        make_init = _dense_init_fn(n, k, n, k, m, m)

    pending = []
    for i in range(n_runs):
        if make_init is not None:
            pzd0, pwz0 = make_init(jax.random.fold_in(base_key, i))
        else:
            pzd0, pwz0 = plsa_init(init_source, k, init=init, rng=rng)
        if bootstrap:
            counts = rng.multinomial(n, uniform).astype(np.float32)
        else:
            counts = np.ones(n, np.float32)
        _, wz_f, _, _, _, _ = sell_fit(
            prepared, pzd0, pwz0, sample_weight=counts,
            n_iter=n_iter, n_iter_per_test=n_iter_per_test, tolerance=tolerance,
        )
        pending.append(wz_f)
    return jnp.concatenate([w[:k, :m] for w in pending], axis=0)


def _sharded_plsa_runs(X, k, n_runs, rng, bootstrap=True, init="random",
                       n_iter=100, n_iter_per_test=10, tolerance=0.001,
                       backend="auto", precision="default", x_dtype="auto",
                       prepared=None):
    """All bootstrap fits in one compiled SPMD program, runs sharded over
    devices (see parallel/mesh.py:build_ensemble_runs_sharded)."""
    from ..parallel import mesh as mesh_lib

    backend = resolve_backend(backend)
    inner = "pallas" if backend == "pallas" else "xla"
    devices = jax.devices()
    n_shards = min(len(devices), n_runs)
    while n_runs % n_shards:
        n_shards -= 1
    mesh = mesh_lib.make_runs_mesh(n_shards)

    if prepared is None:
        from ..ops.driver import prepare_counts

        prepared = prepare_counts(X, backend=backend, x_dtype=x_dtype,
                                  standardize=False)
    Xd = prepared.device_array
    n, m = prepared.n, prepared.m
    n_pad, m_pad = Xd.shape

    from jax.sharding import NamedSharding, PartitionSpec as P

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))

    uniform = np.full(n, 1.0 / n)
    ws = []
    for _ in range(n_runs):
        if bootstrap:
            counts = rng.multinomial(n, uniform).astype(np.float32)
        else:
            counts = np.ones(n, np.float32)
        ws.append(pad_vector(counts, n_pad))

    if init == "random":
        # init factors generated ON DEVICE, directly sharded over the runs
        # mesh: the host path ships n_runs x ~3.5 MB of factor pairs (~56 MB
        # at the flagship config — the dominant cost of this mode on one chip)
        from ..ops.data import round_up

        kp = round_up(k, 8)
        base_key = jax.random.PRNGKey(int(rng.randint(np.iinfo(np.int32).max)))
        zds, wzs = _sharded_inits_fn(mesh, n_pad, kp, n, k, m_pad, m,
                                     n_runs)(base_key)
    else:
        zds, wzs = [], []
        for _ in range(n_runs):
            pzd0, pwz0 = plsa_init(X if X is not None else prepared, k,
                                   init=init, rng=rng)
            zd, wz = pad_factors(pzd0, pwz0, n_pad, m_pad)
            zds.append(zd)
            wzs.append(wz)
        zds = put(np.stack(zds), P("runs"))
        wzs = put(np.stack(wzs), P("runs"))

    Xs = put(Xd, P())
    ws = put(np.stack(ws), P("runs"))

    run = mesh_lib.build_ensemble_runs_sharded(mesh, inner=inner,
                                               precision=precision)
    _, wz_f, _, _ = run(
        Xs, zds, wzs, ws, jnp.float32(tolerance),
        jnp.int32(n_iter), jnp.int32(n_iter_per_test),
    )
    # (n_runs, kp, m_pad) sharded over the runs mesh -> device-resident stack
    return jnp.reshape(wz_f[:, :k, :m], (n_runs * k, m))


def ensemble_of_topics(
    X, k, model="plsa", n_jobs=4, n_runs=16, parallelism="auto", **kwargs
):
    """Generate ``n_runs · k`` candidate topics (reference enstop_.py:164-231).

    Returns a writable numpy array like the reference; ``ensemble_fit`` uses
    the internal device-resident variant so the topic stack never leaves HBM
    on its way into the combiner.

    ``parallelism``:
      * ``"auto"`` (default) — topology-aware: ``"weights"`` on one device,
        ``"sharded"`` across several (see :func:`resolve_parallelism`);
      * ``"weights"`` — device-resident multinomial-weight bootstraps
        (no per-run data copies; the single-chip TPU-native path);
      * ``"sharded"`` — every run in one compiled SPMD program, sharded over all
        devices (the multi-chip fan-out; ~2x slower than "weights" on one chip);
      * ``"resample"`` / ``"none"`` — materialized row-resample per run, exactly
        the reference's sampling (enstop_.py:87-88), fits run sequentially;
      * ``"joblib"`` / ``"dask"`` — the reference's host thread fan-out
        (enstop_.py:209-229): on a CPU backend, runs fit concurrently in a
        thread pool of ``n_jobs`` workers (XLA releases the GIL during
        execution); on an accelerator backend a warning is issued and the
        fits run sequentially (threads cannot help a device-bound workload).
    """
    out = _ensemble_of_topics_device(
        X, k, model=model, n_jobs=n_jobs, n_runs=n_runs,
        parallelism=parallelism, **kwargs
    )
    if isinstance(out, np.ndarray) and out.flags.writeable:
        return out
    # np.asarray of a jax.Array is a read-only zero-copy view; copy so the
    # public surface matches the reference's writable vstack output
    return np.array(out)


def _ensemble_of_topics_device(
    X, k, model="plsa", n_jobs=4, n_runs=16, parallelism="auto", **kwargs
):
    """Internal fan-out: the device paths return the topic stack as a
    device-resident jax.Array (the combiner consumes it in HBM)."""
    known = {"auto", "weights", "sharded", "resample", "none", "joblib", "dask"}
    if parallelism not in known:
        raise ValueError(
            "Unrecognized parallelism {!r}; should be one of {}".format(
                parallelism, tuple(sorted(known))
            )
        )
    # idempotent when ensemble_fit already resolved the mode: concrete
    # strings pass through, and the explicit-'sharded'-on-1-chip warning
    # dedups under the default warnings filter (same emission site)
    parallelism = resolve_parallelism(
        parallelism, model=model, backend=kwargs.get("backend", "auto"),
        n_runs=n_runs, prepared=kwargs.get("prepared"),
    )
    if model == "plsa" and parallelism == "sharded":
        rng = check_random_state(kwargs.get("random_state", None))
        return _sharded_plsa_runs(
            X,
            k,
            n_runs,
            rng,
            bootstrap=kwargs.get("bootstrap", True),
            init=kwargs.get("init", "random"),
            n_iter=kwargs.get("n_iter", 100),
            n_iter_per_test=kwargs.get("n_iter_per_test", 10),
            tolerance=kwargs.get("tolerance", 0.001),
            backend=kwargs.get("backend", "auto"),
            precision=kwargs.get("precision", "default"),
            x_dtype=kwargs.get("x_dtype", "auto"),
            prepared=kwargs.get("prepared"),
        )
    if model == "plsa" and parallelism == "weights":
        rng = check_random_state(kwargs.get("random_state", None))
        return _device_resident_plsa_runs(
            X,
            k,
            n_runs,
            rng,
            bootstrap=kwargs.get("bootstrap", True),
            init=kwargs.get("init", "random"),
            n_iter=kwargs.get("n_iter", 100),
            n_iter_per_test=kwargs.get("n_iter_per_test", 10),
            tolerance=kwargs.get("tolerance", 0.001),
            backend=kwargs.get("backend", "auto"),
            precision=kwargs.get("precision", "default"),
            x_dtype=kwargs.get("x_dtype", "auto"),
            prepared=kwargs.get("prepared"),
        )

    if model == "plsa":
        create_topics = plsa_topics
    elif model == "nmf":
        create_topics = nmf_topics
    else:
        raise ValueError('Model must be one of "plsa" or "nmf"')

    rng = check_random_state(kwargs.get("random_state", None))
    # seeds drawn sequentially up front: run i's stream is identical whether
    # the fits below execute sequentially or on a thread pool
    seeds = [rng.randint(np.iinfo(np.int32).max) for _ in range(n_runs)]

    def one_run(seed):
        return create_topics(X, k, **dict(kwargs, random_state=seed))

    if parallelism in ("joblib", "dask"):
        # the reference's host thread fan-out (enstop_.py:209-229).  Real
        # concurrency only helps when the fits run on the host CPU (XLA
        # releases the GIL during execution); on an accelerator the runs
        # serialize on one device anyway and threads just add contention.
        # nmf solver="cd" is sklearn host work even on a device backend.
        host_bound = jax.default_backend() == "cpu" or (
            model == "nmf" and kwargs.get("solver", "mu") == "cd"
        )
        if host_bound and n_jobs != 1 and n_runs > 1:
            import os
            from concurrent.futures import ThreadPoolExecutor

            workers = n_jobs if n_jobs > 0 else (os.cpu_count() or 1)
            with ThreadPoolExecutor(max_workers=min(workers, n_runs)) as ex:
                return np.vstack(list(ex.map(one_run, seeds)))
        elif not host_bound:
            import warnings

            warnings.warn(
                "parallelism={!r} fans bootstrap fits out over host threads, "
                "which cannot help a device-bound workload on {!r}; running "
                "sequentially (use parallelism='auto' for the device-native "
                "fan-out)".format(parallelism, jax.default_backend()),
                stacklevel=3,
            )

    return np.vstack([one_run(s) for s in seeds])


# ---------------------------------------------------------------------------
# topic combiners (reference enstop_.py:266-414)
# ---------------------------------------------------------------------------

@jax.jit
def _merge_topics_device(T, W):
    """Device merge: ``W`` is the (n_clusters, n_topics) row-normalized
    membership-weight matrix; the sqrt-average is one MXU matmul.  HIGHEST
    precision: the default bf16 multiplies would perturb the stable topics
    ~1e-3 relative vs the numpy rule; this matmul is tiny, exactness is free."""
    avg = jnp.dot(W, jnp.sqrt(jnp.maximum(T, 0.0)),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    sq = avg * avg
    return sq / jnp.maximum(sq.sum(axis=1, keepdims=True), 1e-30)


def _merge_topics_by_label(all_topics, labels, weights=None):
    """Cluster merge rule: squared (weighted) mean of sqrt topic vectors,
    renormalized (reference enstop_.py:310-313, 346-349, 396-406).

    Device-resident topic stacks (jax arrays, as produced by the ensemble
    fan-out) are merged ON DEVICE — the ``n_runs·k × n_words`` stack never
    crosses to the host; only the small stable-topic matrix comes back."""
    n_clusters = int(labels.max()) + 1
    if isinstance(all_topics, jax.Array):
        # pad the cluster axis to multiples of 8 so the merge program is
        # reused across nearby discovered-topic counts (remote compiles are
        # expensive); zero rows fall away on the host slice
        from ..ops.data import round_up

        kc = round_up(n_clusters, 8)
        W = np.zeros((kc, all_topics.shape[0]), np.float32)
        for i in range(n_clusters):
            mask = labels == i
            w = weights[mask] if weights is not None else np.ones(mask.sum())
            if weights is not None and w.sum() <= 0:
                w = np.ones(mask.sum())
            W[i, mask] = w / w.sum()
        return np.asarray(_merge_topics_device(all_topics, jnp.asarray(W)))[:n_clusters]
    result = np.empty((n_clusters, all_topics.shape[1]), dtype=np.float32)
    for i in range(n_clusters):
        mask = labels == i
        if weights is not None:
            w = weights[mask]
            if w.sum() <= 0:
                w = np.ones(mask.sum())
            result[i] = np.average(np.sqrt(all_topics[mask]), axis=0, weights=w) ** 2
        else:
            result[i] = np.mean(np.sqrt(all_topics[mask]), axis=0) ** 2
        result[i] /= result[i].sum()
    return result


def generate_combined_topics_kl(all_topics, min_samples=5, min_cluster_size=5):
    """KL-divergence combiner (reference enstop_.py:266-316): hand-built mutual
    reachability over the (asymmetric) divergence matrix + MST + leaf selection."""
    divergence_matrix = all_pairs_kl_divergence(all_topics)
    core = np.sort(divergence_matrix, axis=1)[:, min_samples]
    tiled = np.tile(core, (core.shape[0], 1))
    mutual_reach = np.dstack(
        [divergence_matrix, divergence_matrix.T, tiled, tiled.T]
    ).max(axis=-1)
    mst = mst_linkage(mutual_reach)
    slt = single_linkage_tree(mst)
    ct = condense_tree(slt, min_cluster_size)
    stability = compute_stability(ct)
    selected = select_clusters(ct, stability, method="leaf")
    if not selected:
        labels = np.zeros(all_topics.shape[0], dtype=np.intp)
    else:
        labels, _ = labels_and_probabilities(ct, selected, all_topics.shape[0])
    if labels.max() < 0:
        labels = np.zeros(all_topics.shape[0], dtype=np.intp)
    return _merge_topics_by_label(all_topics, labels)


def generate_combined_topics_hellinger(all_topics, min_samples=5, min_cluster_size=5):
    """Hellinger combiner (reference enstop_.py:319-351): precomputed-metric
    HDBSCAN, leaf selection."""
    distance_matrix = all_pairs_hellinger_distance(all_topics)
    labels = HDBSCAN(
        min_samples=min_samples,
        min_cluster_size=min_cluster_size,
        metric="precomputed",
        cluster_selection_method="leaf",
    ).fit_predict(distance_matrix)
    if labels.max() < 0:
        labels = np.zeros(all_topics.shape[0], dtype=np.intp)
    return _merge_topics_by_label(all_topics, labels)


def generate_combined_topics_hellinger_umap(
    all_topics, min_samples=5, min_cluster_size=5, n_neighbors=15, reduced_dim=5,
    random_state=None,
):
    """Default combiner (reference enstop_.py:354-411): 5D UMAP embedding under
    Hellinger distance, then euclidean HDBSCAN with leaf selection +
    allow_single_cluster; clusters merged with membership-strength weights."""
    dmat = all_pairs_hellinger_distance(all_topics)
    embedding = umap_embed(
        dmat=dmat,
        n_components=reduced_dim,
        n_neighbors=n_neighbors,
        random_state=random_state,
    )
    clusterer = HDBSCAN(
        min_samples=min_samples,
        min_cluster_size=min_cluster_size,
        cluster_selection_method="leaf",
        allow_single_cluster=True,
    ).fit(embedding)
    labels = clusterer.labels_
    strengths = clusterer.probabilities_
    if labels.max() < 0:
        labels = np.zeros(all_topics.shape[0], dtype=np.intp)
        strengths = np.ones(all_topics.shape[0])
    return _merge_topics_by_label(all_topics, labels, weights=strengths)


_topic_combiner = {
    "kl_divergence": generate_combined_topics_kl,
    "hellinger": generate_combined_topics_hellinger,
    "hellinger_umap": generate_combined_topics_hellinger_umap,
}


# ---------------------------------------------------------------------------
# ensemble fit (reference enstop_.py:417-584)
# ---------------------------------------------------------------------------

def ensemble_fit(
    X,
    estimated_n_topics=10,
    model="plsa",
    init="random",
    min_samples=3,
    min_cluster_size=4,
    n_starts=16,
    n_jobs=1,
    parallelism="auto",
    topic_combination="hellinger_umap",
    bootstrap=True,
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=1e-16,
    lift_factor=1,
    beta_loss=1,
    alpha=0.0,
    solver="mu",
    random_state=None,
    backend="auto",
    x_dtype="auto",
    precision="default",
):
    """Full ensemble pipeline; returns ``(doc_vectors, stable_topics)``.

    Stage wall times land in ``ensemble_fit.last_timings`` (staging / runs /
    combine / refit) for observability.

    ``precision``: matmul/E-step precision for the bootstrap fits and the
    final refit (``"default"`` / ``"highest"`` / ``"fast"`` — see
    :func:`enstop_tpu.ops.driver.plsa_fit`).  ``"fast"`` (bf16
    responsibilities) perturbs each run's factors at bf16 rounding level; the
    ensemble's topic clustering is designed to be stable under exactly this
    kind of run-to-run jitter, so it is the recommended speed mode here.
    On ``backend="sparse"`` the fan-out runs the O(nnz) SELL kernels, which
    have no bf16-responsibilities mode — ``"fast"`` warns and runs at
    default precision there.
    """
    import time as _time

    from ..ops.driver import PreparedCounts, prepare_counts
    from ..ops.sell import PreparedSell, prepare_sell

    timings = {}
    t0 = _time.perf_counter()
    parallelism = resolve_parallelism(
        parallelism, model=model, backend=backend, n_runs=n_starts,
        prepared=X if isinstance(X, (PreparedCounts, PreparedSell)) else None,
    )
    if isinstance(X, (PreparedCounts, PreparedSell)):
        prepared, X = X, None
        if model != "plsa" or parallelism not in ("weights", "sharded"):
            raise ValueError(
                "Prepared input requires model='plsa' and "
                "parallelism='weights' or 'sharded'"
            )
    else:
        X = check_array(X, accept_sparse="csr", dtype=np.float32)
        if not issparse(X):
            X = csr_matrix(X)
        # one device-resident copy (dense-padded, or O(nnz) sparse for
        # backend="sparse") shared by every bootstrap fit and the final refit
        prepared = None
        if model == "plsa" and parallelism == "weights" and backend == "sparse":
            prepared = prepare_sell(X, standardize=False)
        elif model == "plsa" and parallelism in ("weights", "sharded"):
            prepared = prepare_counts(X, backend=backend, x_dtype=x_dtype,
                                      standardize=False)
    timings["staging_s"] = _time.perf_counter() - t0

    t0 = _time.perf_counter()
    all_topics = _ensemble_of_topics_device(
        X,
        estimated_n_topics,
        model=model,
        n_jobs=n_jobs,
        n_runs=n_starts,
        parallelism=parallelism,
        init=init,
        n_iter=n_iter,
        n_iter_per_test=n_iter_per_test,
        tolerance=tolerance,
        e_step_thresh=e_step_thresh,
        bootstrap=bootstrap,
        beta_loss=beta_loss,
        alpha=alpha,
        solver=solver,
        random_state=random_state,
        backend=backend,
        x_dtype=x_dtype,
        precision=precision,
        prepared=prepared,
    )

    timings["runs_s"] = _time.perf_counter() - t0

    if topic_combination in _topic_combiner:
        cluster_topics = _topic_combiner[topic_combination]
    else:
        raise ValueError(
            "topic_combination must be one of {}".format(tuple(_topic_combiner.keys()))
        )

    t0 = _time.perf_counter()
    if topic_combination == "hellinger_umap":
        stable_topics = cluster_topics(
            all_topics, min_samples, min_cluster_size, random_state=random_state
        )
    else:
        stable_topics = cluster_topics(all_topics, min_samples, min_cluster_size)
    timings["combine_s"] = _time.perf_counter() - t0

    if lift_factor != 1:
        stable_topics = stable_topics ** lift_factor
        stable_topics /= stable_topics.sum(axis=1, keepdims=True)

    t0 = _time.perf_counter()
    if model == "plsa":
        refit_input = prepared if prepared is not None else X
        sample_weight = _check_sample_weight(None, refit_input, dtype=np.float32)
        doc_vectors = plsa_refit(
            refit_input,
            stable_topics,
            sample_weight=sample_weight,
            e_step_thresh=e_step_thresh,
            random_state=random_state,
            backend=backend,
            precision=precision,
        )
    elif model == "nmf":
        from ..ops.nmf import nmf_fit_mu

        doc_vectors, _ = nmf_fit_mu(
            X,
            stable_topics.shape[0],
            beta_loss=beta_loss,
            H_init=stable_topics,
            update_H=False,
            random_state=random_state,
        )
    else:
        raise ValueError('Model must be one of "plsa" or "nmf"')
    timings["refit_s"] = _time.perf_counter() - t0

    ensemble_fit.last_timings = timings
    return doc_vectors, stable_topics


class EnsembleTopics(TopicModelBase):
    """Ensemble topic modeling estimator (reference enstop_.py:587-927).

    Fitted attributes: ``components_`` (n_components_, n_words), ``embedding_``,
    ``training_data_``, and ``n_components_`` — the *discovered* number of stable
    topics (may differ from ``n_components``).
    """

    def __init__(
        self,
        n_components=10,
        model="plsa",
        init="random",
        n_starts=16,
        min_samples=3,
        min_cluster_size=5,
        n_jobs=8,
        parallelism="auto",
        topic_combination="hellinger_umap",
        bootstrap=True,
        n_iter=80,
        n_iter_per_test=10,
        tolerance=0.001,
        e_step_thresh=1e-32,
        lift_factor=1,
        beta_loss=1,
        alpha=0.0,
        solver="mu",
        transform_random_seed=42,
        random_state=None,
        backend="auto",
        x_dtype="auto",
        precision="default",
    ):
        self.n_components = n_components
        self.model = model
        self.init = init
        self.n_starts = n_starts
        self.min_samples = min_samples
        self.min_cluster_size = min_cluster_size
        self.n_jobs = n_jobs
        self.parallelism = parallelism
        self.topic_combination = topic_combination
        self.bootstrap = bootstrap
        self.n_iter = n_iter
        self.n_iter_per_test = n_iter_per_test
        self.tolerance = tolerance
        self.e_step_thresh = e_step_thresh
        self.lift_factor = lift_factor
        self.beta_loss = beta_loss
        self.alpha = alpha
        self.solver = solver
        self.transform_random_seed = transform_random_seed
        self.random_state = random_state
        self.backend = backend
        self.x_dtype = x_dtype
        self.precision = precision

    def fit_transform(self, X, y=None, **fit_params):
        from ..ops.driver import PreparedCounts
        from ..ops.sell import PreparedSell

        if fit_params.pop("sample_weight", None) is not None:
            # the reference's EnsembleTopics.fit takes no sample_weight
            # (enstop_.py:753) and errors loudly; silently dropping weights
            # would return an unweighted fit the caller believes is weighted
            raise TypeError(
                "EnsembleTopics does not support sample_weight (the "
                "reference's ensemble has no weighted path); weight the "
                "individual PLSA fits instead"
            )
        if not isinstance(X, (PreparedCounts, PreparedSell)):
            X = check_array(X, accept_sparse="csr")
            if not issparse(X):
                X = csr_matrix(X)
            if np.any(X.data < 0):
                # same guard as the pLSA estimators (reference plsa.py:1146-
                # 1149; negative entries make EM nonsense silently)
                raise ValueError(
                    "EnsembleTopics is only valid for matrices with "
                    "non-negative entries (Negative values in data passed "
                    "to fit)"
                )

        U, V = ensemble_fit(
            X,
            self.n_components,
            model=self.model,
            init=self.init,
            min_samples=self.min_samples,
            min_cluster_size=self.min_cluster_size,
            n_starts=self.n_starts,
            n_jobs=self.n_jobs,
            parallelism=self.parallelism,
            topic_combination=self.topic_combination,
            bootstrap=self.bootstrap,
            n_iter=self.n_iter,
            n_iter_per_test=self.n_iter_per_test,
            tolerance=self.tolerance,
            e_step_thresh=self.e_step_thresh,
            lift_factor=self.lift_factor,
            beta_loss=self.beta_loss,
            alpha=self.alpha,
            solver=self.solver,
            random_state=self.random_state,
            backend=self.backend,
            x_dtype=self.x_dtype,
            precision=self.precision,
        )
        from ..ops.driver import PreparedCounts
        from ..ops.sell import PreparedSell

        self.components_ = V
        self.embedding_ = U
        self.training_data_ = (None if isinstance(X, (PreparedCounts, PreparedSell))
                               else X)
        self.n_components_ = self.components_.shape[0]
        return U

    def transform(self, X, y=None):
        """Embed new documents against the discovered stable topics."""
        X = check_array(X, accept_sparse="csr")
        self._validate_transform_input(X)
        random_state = check_random_state(self.transform_random_seed)
        if not issparse(X):
            X = coo_matrix(X)
        return plsa_refit(
            X,
            self.components_,
            n_iter=50,
            n_iter_per_test=5,
            tolerance=0.001,
            random_state=random_state,
            backend=self.backend,
            precision=self.precision,
        )
