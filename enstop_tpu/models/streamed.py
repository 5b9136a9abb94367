"""Streamed / out-of-core pLSA: bounded device memory, host→HBM block feed.

Successor of the reference's ``StreamedPLSA`` (streamed_plsa.py:322-1039), which
bounds memory by processing fixed-size windows of nonzeros with a transient
responsibilities slab and deferred normalization.  The TPU rebuild streams dense
*document row-blocks* instead:

* per EM iteration, each (block_docs, m) slab is shipped host→HBM and hits the
  fused kernel once; ``P(w|z)``'s accumulator ``A`` lives on device across blocks
  and is normalized after the pass (the reference's deferred normalize,
  streamed_plsa.py:383-389); each block's ``P(z|d)`` rows update immediately
  (row-local normalization commutes with the deferred one);
* JAX's async dispatch double-buffers automatically: the next block's H2D
  transfer overlaps the previous block's kernel;
* ``transform``/refit streams each block ONCE and runs all refit iterations
  on-device for that block (topics are frozen, so blocks are independent) —
  strictly less traffic than the reference's per-iteration re-stream.

Device-resident state: ``P(w|z)``, ``A``, one ``P(z|d)`` block, and two X blocks
in flight — independent of corpus size.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import coo_matrix, issparse
from sklearn.utils import check_array, check_random_state

import jax
import jax.numpy as jnp

from ..ops import em as em_ops
from ..ops.data import round_up
from ..ops.driver import resolve_backend
from ..ops.init import plsa_init
from .base import TopicModelBase, reinsert_zero_rows, split_zero_rows, validate_corpus

_TINY = 1e-30


def _block_accumulators(backend):
    if backend == "pallas":
        from ..ops import pallas_em

        def accum(Xb, zdb, wz, wb):
            return pallas_em.em_accumulators_fused(
                Xb, zdb, wz, sample_weight=wb, compute_ll=False
            )

        def accum_ll(Xb, zdb, wz, wb):
            return pallas_em.log_likelihood_fused(Xb, zdb, wz, sample_weight=wb)

    else:

        def accum(Xb, zdb, wz, wb):
            return em_ops.em_accumulators_dense(Xb, zdb, wz, sample_weight=wb)

        def accum_ll(Xb, zdb, wz, wb):
            return em_ops.log_likelihood_dense(Xb, zdb, wz, sample_weight=wb)

    return accum, accum_ll


def streamed_plsa_fit(
    X,
    k,
    sample_weight=None,
    init="random",
    block_docs=4096,
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    random_state=None,
    backend="auto",
):
    """EM fit with host-resident data streamed block-by-block each iteration."""
    backend = resolve_backend(backend)
    rng = check_random_state(random_state)
    n, m = X.shape

    if backend == "pallas":
        from ..ops.pallas_em import pick_block_shape

        bd, bw = pick_block_shape(min(block_docs, n), m)
        block_docs = max(bd, round_up(min(block_docs, n), bd))
        m_pad = round_up(m, bw)
    else:
        block_docs = max(8, round_up(min(block_docs, n), 8))
        m_pad = round_up(m, 128)

    pzd0, pwz0 = plsa_init(X, k, init=init, rng=rng)
    kp = round_up(k, 8)

    Xcsr = X.tocsr() if issparse(X) else None
    n_blocks = -(-n // block_docs)
    n_pad = n_blocks * block_docs

    # densified numpy blocks (host cache; H2D re-streamed every iteration),
    # packed by the native OpenMP scatter (enstop_tpu/native/packer.c)
    from ..native import densify_csr_rows

    blocks = []
    for b in range(n_blocks):
        lo, hi = b * block_docs, min((b + 1) * block_docs, n)
        blk = np.zeros((block_docs, m_pad), dtype=np.float32)
        if Xcsr is not None:
            densify_csr_rows(Xcsr, lo, hi, blk)
        else:
            blk[: hi - lo, :m] = X[lo:hi]
        blocks.append(blk)

    zd_blocks = []
    for b in range(n_blocks):
        lo, hi = b * block_docs, min((b + 1) * block_docs, n)
        zb = np.zeros((block_docs, kp), dtype=np.float32)
        zb[: hi - lo, :k] = pzd0[lo:hi]
        zd_blocks.append(jnp.asarray(zb))

    wz = np.zeros((kp, m_pad), dtype=np.float32)
    wz[:k, :m] = pwz0
    wz = jnp.asarray(wz)

    weighted = sample_weight is not None and bool(np.any(np.asarray(sample_weight) != 1.0))
    w_blocks = []
    for b in range(n_blocks):
        lo, hi = b * block_docs, min((b + 1) * block_docs, n)
        wb = np.zeros((block_docs,), dtype=np.float32)
        wb[: hi - lo] = (
            np.asarray(sample_weight[lo:hi], np.float32) if weighted else 1.0
        )
        w_blocks.append(jnp.asarray(wb))

    accum, accum_ll = _block_accumulators(backend)

    @jax.jit
    def block_step(Xb, zdb, wz, wb):
        A_b, B_b, _ = accum(Xb, zdb, wz, wb)
        num_zd = zdb * B_b
        new_zdb = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)
        return A_b, new_zdb

    @jax.jit
    def block_ll(Xb, zdb, wz, wb):
        return accum_ll(Xb, zdb, wz, wb)

    @jax.jit
    def finish_wz(wz, A_acc):
        num = wz * A_acc
        return num / jnp.maximum(num.sum(axis=1, keepdims=True), _TINY)

    def full_ll():
        total = 0.0
        for b in range(n_blocks):
            total += float(block_ll(jnp.asarray(blocks[b]), zd_blocks[b], wz, w_blocks[b]))
        return total

    prev_ll = full_ll()
    steps_done = 0
    for i in range(int(n_iter)):
        A_acc = jnp.zeros((kp, m_pad), jnp.float32)
        for b in range(n_blocks):
            A_b, zd_blocks[b] = block_step(
                jnp.asarray(blocks[b]), zd_blocks[b], wz, w_blocks[b]
            )
            A_acc = A_acc + A_b
        wz = finish_wz(wz, A_acc)
        steps_done += 1
        if i % int(n_iter_per_test) == 0:
            cur = full_ll()
            change = abs(cur - prev_ll)
            if change == 0 or change / abs(cur) < tolerance:
                break
            prev_ll = cur

    zd_full = np.vstack([np.asarray(zb) for zb in zd_blocks])[:n, :k]
    return zd_full, np.asarray(wz)[:k, :m], steps_done


def streamed_plsa_refit(
    X,
    topics,
    block_docs=4096,
    n_iter=50,
    random_state=None,
    backend="auto",
):
    """Frozen-topic refit, one streaming pass: each block runs all its refit
    iterations on-device before the next block is shipped."""
    backend = resolve_backend(backend)
    rng = check_random_state(random_state)
    n, m = X.shape
    k = topics.shape[0]
    kp = round_up(k, 8)

    if backend == "pallas":
        from ..ops.pallas_em import pick_block_shape

        bd, bw = pick_block_shape(min(block_docs, n), m)
        block_docs = max(bd, round_up(min(block_docs, n), bd))
        m_pad = round_up(m, bw)
    else:
        block_docs = max(8, round_up(min(block_docs, n), 8))
        m_pad = round_up(m, 128)

    wz = np.zeros((kp, m_pad), dtype=np.float32)
    wz[:k, :m] = topics
    wz = jnp.asarray(wz)

    if backend == "pallas":
        from ..ops import pallas_em

        def refit_once(Xb, zdb, wz):
            new_zd, _ = pallas_em.refit_step_fused(Xb, zdb, wz, compute_ll=False)
            return new_zd

    else:

        def refit_once(Xb, zdb, wz):
            new_zd, _ = em_ops.refit_step_dense(Xb, zdb, wz)
            return new_zd

    @jax.jit
    def refit_block(Xb, zdb, wz):
        def body(_, z):
            return refit_once(Xb, z, wz)

        return jax.lax.fori_loop(0, int(n_iter), body, zdb)

    from ..native import densify_csr_rows

    Xcsr = X.tocsr() if issparse(X) else None
    n_blocks = -(-n // block_docs)
    out = np.zeros((n, k), dtype=np.float32)
    for b in range(n_blocks):
        lo, hi = b * block_docs, min((b + 1) * block_docs, n)
        blk = np.zeros((block_docs, m_pad), dtype=np.float32)
        if Xcsr is not None:
            densify_csr_rows(Xcsr, lo, hi, blk)
        else:
            blk[: hi - lo, :m] = X[lo:hi]
        zb = np.zeros((block_docs, kp), dtype=np.float32)
        zb[: hi - lo, :k] = rng.rand(hi - lo, k)
        zb[: hi - lo, :k] /= zb[: hi - lo, :k].sum(axis=1, keepdims=True)
        res = refit_block(jnp.asarray(blk), jnp.asarray(zb), wz)
        out[lo:hi] = np.asarray(res)[: hi - lo, :k]
    return out


class StreamedPLSA(TopicModelBase):
    """Out-of-core pLSA (reference streamed_plsa.py:1042-1337).

    ``block_size`` is the number of *documents* streamed per block (the reference
    streams windows of 65536 *nonzeros*; dense row-blocks are the TPU-native unit
    — at typical text density the default 4096 docs ≈ a few hundred thousand
    nonzeros per block).
    """

    def __init__(
        self,
        n_components=10,
        init="random",
        block_size=4096,
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
        self.block_size = block_size
        self.n_iter = n_iter
        self.n_iter_per_test = n_iter_per_test
        self.tolerance = tolerance
        self.e_step_thresh = e_step_thresh
        self.transform_random_seed = transform_random_seed
        self.random_state = random_state
        self.backend = backend

    def fit_transform(self, X, y=None, sample_weight=None):
        X, sample_weight = validate_corpus(X, sample_weight)
        data, good_rows, zero_rows_found = split_zero_rows(X)

        U, V, n_steps = streamed_plsa_fit(
            data,
            self.n_components,
            sample_weight=sample_weight[good_rows] if zero_rows_found else sample_weight,
            init=self.init,
            block_docs=self.block_size,
            n_iter=self.n_iter,
            n_iter_per_test=self.n_iter_per_test,
            tolerance=self.tolerance,
            random_state=self.random_state,
            backend=self.backend,
        )
        if zero_rows_found:
            self.embedding_ = reinsert_zero_rows(U, good_rows, X.shape[0], self.n_components)
        else:
            self.embedding_ = U
        self.components_ = V
        self.training_data_ = X
        self.n_iter_ = n_steps
        return self.embedding_

    def transform(self, X, y=None):
        X = check_array(X, accept_sparse="csr")
        if not issparse(X):
            X = coo_matrix(X).tocsr()
        return streamed_plsa_refit(
            X,
            self.components_,
            block_docs=self.block_size,
            random_state=check_random_state(self.transform_random_seed),
            backend=self.backend,
        )
