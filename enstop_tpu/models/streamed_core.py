"""Out-of-core streamed pLSA: host memory O(nnz), device memory O(block).

Successor of the reference's ``StreamedPLSA`` (streamed_plsa.py:322-1039).
The round-1 implementation pre-densified every document block into host RAM
(O(n·m) — the dense 8M-doc corpus it claimed to serve would need terabytes);
this one keeps the corpus as per-block *sparse chunk arrays*:

* at fit start each document block is packed ONCE into the dual-sorted chunk
  layout of ops/pallas_sell.py (host memory ~= 3 int/float arrays per nonzero,
  twice — O(nnz), like the reference's CSR);
* every EM iteration streams each block's chunks host→HBM and runs the fused
  chunk kernels: the word pass accumulates the global ``P(w|z)`` numerator
  (deferred normalize, exactly streamed_plsa.py:383-389), the doc pass updates
  that block's ``P(z|d)`` rows (row-local normalization commutes);
* the log-likelihood comes FREE from the doc pass (it evaluates the
  pre-update factors), so convergence testing never costs an extra stream:
  the reference's test after iteration T uses LL(state_T), which this loop
  collects during iteration T+1 — factors are checkpointed at test points so
  an early stop returns exactly the reference's state;
* JAX async dispatch overlaps each block's H2D with the previous block's
  kernels (double buffering).

Device-resident state: ``P(w|z)``, the A accumulator, one block's ``P(z|d)``
and chunk arrays in flight — independent of corpus size.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy.sparse import issparse, csr_matrix

import jax
import jax.numpy as jnp

from ..ops import pallas_sell as ps
from ..ops import sell as sell_ops
from ..ops.init import plsa_init

_TINY = 1e-30


def _pad_side(owner, idx, val, target_rows):
    """Pad one SELL side's arrays to ``target_rows`` segment rows (absorbing:
    owner 0, zero vals)."""
    return (sell_ops.pad_rows(owner, target_rows),
            sell_ops.pad_rows(idx, target_rows),
            sell_ops.pad_rows(val, target_rows))


# per-block doc-indexed arrays (zd rows / weights) pad with the same shared
# absorbing-row padder: padding docs are never referenced by any packed entry,
# and with it the tail block shares the full blocks' compiled step programs
_pad_block_rows = sell_ops.pad_rows


def _use_pallas():
    # the XLA SELL block ops measure as fast or faster than the Pallas chunk
    # kernels on TPU (see ops/sell.py:prepare_sell) and have no chunk-count
    # ceiling, so SELL is the default; ENSTOP_STREAMED_PALLAS=1 opts a fit
    # into the Pallas chunk layout (kept for experimentation / future
    # hardware where the chunk kernels win)
    import os

    return os.environ.get("ENSTOP_STREAMED_PALLAS", "").strip().lower() in (
        "1", "true", "on")


class _BlockStore:
    """Per-block packed sparse arrays (host, O(nnz_block)).

    SELL blocks are packed at UNIFORM shapes: one per-side lane for every
    block (decided from indptr in a cheap pre-pass, like
    parallel/sparse_mesh.py:shard_sell) and every side's segment-row count
    padded to the cross-block maximum.  Shape-uniform blocks mean the jitted
    per-block step programs (`_block_step_fns`) compile ONCE per fit rather
    than once per content-dependent block shape — measured 14 distinct shapes
    over 16 blocks before, i.e. ~14x the remote-compile cost on this
    environment's 30s-10min-per-program relay.  Padding segment rows carry
    owner 0 with zero vals, absorbing through every update and the LL.
    """

    def __init__(self, X, block_docs, use_pallas, lane=None):
        Xcsr = X.tocsr() if issparse(X) else csr_matrix(np.asarray(X))
        n, m = Xcsr.shape
        self.n, self.m = n, m
        self.block_docs = block_docs
        self.n_blocks = -(-n // block_docs)
        self.use_pallas = use_pallas
        self.blocks = []
        self.block_rows = [
            (b * block_docs, min((b + 1) * block_docs, n))
            for b in range(self.n_blocks)
        ]
        if use_pallas:
            for lo, hi in self.block_rows:
                self.blocks.append(ps.pack_chunks(Xcsr[lo:hi]))
            return

        if lane is not None:
            lane_d = lane_w = lane
        else:
            lane_d = lane_w = 8
            indptr = Xcsr.indptr
            for lo, hi in self.block_rows:
                nnz_b = int(indptr[hi] - indptr[lo])
                lane_d = max(lane_d, sell_ops._auto_lane(nnz_b, hi - lo))
                lane_w = max(lane_w, sell_ops._auto_lane(nnz_b, m))
        for lo, hi in self.block_rows:
            self.blocks.append(
                sell_ops.pack_sell(Xcsr[lo:hi], lane=lane_d, lane_words=lane_w)
            )
        rd = max(b.row_doc.shape[0] for b in self.blocks)
        rw = max(b.col_word.shape[0] for b in self.blocks)
        for blk in self.blocks:
            blk.row_doc, blk.cols_a, blk.vals_a = _pad_side(
                blk.row_doc, blk.cols_a, blk.vals_a, rd)
            blk.col_word, blk.rows_b, blk.vals_b = _pad_side(
                blk.col_word, blk.rows_b, blk.vals_b, rw)

    def host_bytes(self):
        total = 0
        for blk in self.blocks:
            if self.use_pallas:
                for side in (blk.word_major, blk.doc_major):
                    total += side.rows_local.nbytes + side.cols_local.nbytes
                    total += side.vals.nbytes + side.chunk_i.nbytes
                    total += side.chunk_j.nbytes + side.first_of_major.nbytes
            else:
                for name in ("row_doc", "cols_a", "vals_a", "col_word",
                             "rows_b", "vals_b", "doc_segs", "word_segs"):
                    arr = getattr(blk, name)
                    if arr is not None:
                        total += arr.nbytes
        return total


@lru_cache(maxsize=4)
def _finish_wz_fn(multiply_prior):
    """Deferred P(w|z) normalize (streamed_plsa.py:383-389), compiled once.
    With exact thresholding the block contributions already carry wz, so the
    prior multiply is skipped."""

    @jax.jit
    def finish_wz(wz, a_sum):
        num = (wz * a_sum) if multiply_prior else a_sum
        return num / jnp.maximum(num.sum(axis=1, keepdims=True), _TINY)

    return finish_wz


@lru_cache(maxsize=16)
def _block_step_fns(use_pallas, thresh=None):
    """(word_accum, doc_update) closures over device chunk/SELL arrays.

    ``thresh``: a materially-firing ``e_step_thresh`` (reference
    plsa.py:97-102) applied exactly, like the resident sparse path.
    Cached per (use_pallas, thresh) so the jitted XLA block-step programs
    are compiled once per process, not once per fit (remote compiles cost
    30s+ here)."""
    if use_pallas:

        def word_accum(dev, zd_b, wz, w_b, blk):
            # A numerator contribution of this block: full (m, k), zeros
            # where the block has no entries
            zd_p, wzT_p, kp = ps._padded_factors(zd_b, wz, blk.n_pad, blk.m_pad)
            w_col = jnp.zeros((blk.n_pad, 1), jnp.float32).at[: zd_b.shape[0], 0].set(w_b)
            a_acc, _ = ps._word_pass(dev["word_major"], zd_p, wzT_p, w_col,
                                     blk.bd, blk.bw, False, thresh,
                                     blk.n_pad, blk.m_pad)
            return a_acc[: wz.shape[1], : zd_b.shape[1]].T      # (k, m)

        def doc_update(dev, zd_b, wz, w_b, blk):
            zd_p, wzT_p, kp = ps._padded_factors(zd_b, wz, blk.n_pad, blk.m_pad)
            w_col = jnp.zeros((blk.n_pad, 1), jnp.float32).at[: zd_b.shape[0], 0].set(w_b)
            b_acc, ll = ps._doc_pass(dev["doc_major"], zd_p, wzT_p, w_col,
                                     blk.bd, blk.bw, True, thresh,
                                     blk.n_pad, blk.m_pad)
            b = b_acc[: zd_b.shape[0], : zd_b.shape[1]]
            num = (zd_b * b) if thresh is None else b
            new_zd = num / jnp.maximum(num.sum(axis=1, keepdims=True), _TINY)
            return new_zd, ll

        def ship(blk):
            return ps.device_chunks(blk)

    else:

        @jax.jit
        def _word_accum_jit(dev, zd_b, wz, w_b):
            wzT = wz.T
            wz_rows = wzT[dev["col_word"]]
            vals_b = dev["vals_b"] * w_b[dev["rows_b"]]
            contrib, _ = sell_ops._pass_contrib(wz_rows, dev["rows_b"], vals_b,
                                                zd_b, thresh)
            return sell_ops._segsum_scatter(
                contrib, dev["col_word"], wz.shape[1]).T  # (k, m)

        @jax.jit
        def _doc_update_jit(dev, zd_b, wz, w_b):
            wzT = wz.T
            zd_rows = zd_b[dev["row_doc"]]
            contrib, s = sell_ops._pass_contrib(zd_rows, dev["cols_a"],
                                                dev["vals_a"], wzT, thresh)
            B = sell_ops._segsum_scatter(contrib, dev["row_doc"], zd_b.shape[0])
            num = (zd_b * B) if thresh is None else B
            new_zd = num / jnp.maximum(num.sum(axis=1, keepdims=True), _TINY)
            term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
            ll = (term * w_b[dev["row_doc"]][:, None]).sum()
            return new_zd, ll

        def word_accum(dev, zd_b, wz, w_b, blk):
            return _word_accum_jit(dev, zd_b, wz, w_b)

        def doc_update(dev, zd_b, wz, w_b, blk):
            return _doc_update_jit(dev, zd_b, wz, w_b)

        def ship(blk):
            return sell_ops.device_arrays(blk)

    return word_accum, doc_update, ship


def streamed_fit_core(
    X,
    k,
    sample_weight=None,
    init="random",
    block_docs=65536,
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=None,
    random_state=None,
):
    """Out-of-core EM fit.  Returns ``(zd, wz, n_steps, ll_trace)``.

    Matches the flat fit's trajectory: the convergence schedule, tested LL
    values, and returned state are the reference's (tests after iteration 1,
    1+npt, ...; an early stop returns the factors AT the converged test point).
    """
    from sklearn.utils import check_random_state

    from ..ops.sell import THRESH_MATERIAL

    rng = check_random_state(random_state)
    use_pallas = _use_pallas()
    store = _BlockStore(X, block_docs, use_pallas)
    n, m = store.n, store.m
    thresh = (float(e_step_thresh)
              if e_step_thresh is not None and e_step_thresh > THRESH_MATERIAL
              else None)

    pzd0, pwz0 = plsa_init(X, k, init=init, rng=rng)
    wz = jnp.asarray(pwz0)
    bh = block_docs if not use_pallas else None  # uniform height (SELL path)
    pad = (lambda a: _pad_block_rows(a, bh)) if bh else (lambda a: a)
    zd_blocks = [jnp.asarray(pad(pzd0[lo:hi])) for lo, hi in store.block_rows]
    weighted = sample_weight is not None and bool(
        np.any(np.asarray(sample_weight) != 1.0)
    )
    w_np = (np.asarray(sample_weight, np.float32) if weighted
            else np.ones(n, np.float32))
    w_blocks = [jnp.asarray(pad(w_np[lo:hi])) for lo, hi in store.block_rows]

    word_accum, doc_update, ship = _block_step_fns(use_pallas, thresh)
    finish_wz = _finish_wz_fn(thresh is None)

    # test points per the reference schedule (plsa.py:516-640): after
    # iteration 1, then every n_iter_per_test
    npt = max(int(n_iter_per_test), 1)
    test_points = {1} | {1 + j * npt for j in range(1, int(n_iter) // npt + 1)}

    ll_trace = []
    prev_ll = None
    saved = None            # factors checkpoint at the last test point
    saved_at = None
    steps_run = 0

    for t in range(1, int(n_iter) + 1):
        if (t - 1) in test_points:
            # the LL collected during THIS sweep is LL(state after t-1 iters)
            saved = ([np.asarray(zb) for zb in zd_blocks], np.asarray(wz))
            saved_at = t - 1
        a_sum = jnp.zeros((k, m), jnp.float32)
        ll_acc = jnp.float32(0.0)
        for b in range(store.n_blocks):
            dev = ship(store.blocks[b])    # H2D; async under dispatch
            a_sum = a_sum + word_accum(dev, zd_blocks[b], wz, w_blocks[b],
                                       store.blocks[b])
            zd_blocks[b], ll_b = doc_update(dev, zd_blocks[b], wz,
                                            w_blocks[b], store.blocks[b])
            ll_acc = ll_acc + ll_b
        wz = finish_wz(wz, a_sum)
        steps_run = t

        if (t - 1) in test_points and t - 1 >= 1:
            cur = float(ll_acc)            # LL(state_{t-1})
            ll_trace.append(cur)
            if prev_ll is not None:
                change = abs(cur - prev_ll)
                if change == 0.0 or change / abs(cur) < tolerance:
                    zd_full = np.vstack(saved[0])[:n]
                    return zd_full, saved[1], saved_at, ll_trace
            prev_ll = cur
        elif t == 1:
            ll_trace.append(float(ll_acc))  # LL(init state), reference's first value
            prev_ll = float(ll_acc)

    # a test point landing exactly on n_iter needs one more streamed LL pass
    # (its value would otherwise only be collected by iteration n_iter+1)
    if int(n_iter) in test_points and steps_run == int(n_iter):
        ll_acc = jnp.float32(0.0)
        for b in range(store.n_blocks):
            dev = ship(store.blocks[b])
            _, ll_b = doc_update(dev, zd_blocks[b], wz, w_blocks[b],
                                 store.blocks[b])
            ll_acc = ll_acc + ll_b
        ll_trace.append(float(ll_acc))

    zd_full = np.vstack([np.asarray(zb) for zb in zd_blocks])[:n]
    return zd_full, np.asarray(wz), steps_run, ll_trace


def streamed_refit_core(
    X,
    topics,
    sample_weight=None,
    block_docs=65536,
    n_iter=50,
    n_iter_per_test=10,
    tolerance=0.005,
    e_step_thresh=None,
    random_state=None,
):
    """Frozen-topic refit with the dense refit's exact convergence schedule.

    Iterations run in *chunks*: each block is shipped once per chunk and
    sweeps the chunk's iterations on device, so H2D traffic is
    O(nnz · n_tests) instead of the reference's per-iteration re-stream
    (streamed_plsa.py:701-847).  The log-likelihood of the state at test
    point T comes free from the first iteration of the next chunk (the same
    fold streamed_fit_core uses), and on convergence the returned embedding
    is the host checkpoint AT the test point — trajectory-identical to
    ``ops/driver.py:plsa_refit`` on the same ``random_state`` (the
    reference's own refit gate is dead, plsa.py:913; fixed here like every
    other backend).  ``e_step_thresh`` is applied exactly when material,
    like the resident sparse path.

    ``sample_weight`` matches the reference's streamed refit semantics
    (streamed_plsa.py:713-957): the frozen-topic M-step ignores it and only
    the convergence log-likelihood is doc-weighted (both block-step paths
    here already apply ``w`` to the LL term only).
    """
    from sklearn.utils import check_random_state

    from ..ops.sell import THRESH_MATERIAL

    rng = check_random_state(random_state)
    use_pallas = _use_pallas()
    store = _BlockStore(X, block_docs, use_pallas)
    n, m = store.n, store.m
    k = topics.shape[0]
    thresh = (float(e_step_thresh)
              if e_step_thresh is not None and e_step_thresh > THRESH_MATERIAL
              else None)
    wz = jnp.asarray(np.asarray(topics, np.float32))
    _, doc_update, ship = _block_step_fns(use_pallas, thresh)

    # init exactly like the dense refit (driver.py:plsa_refit): ONE
    # full-matrix draw, l1-normalized, split by block — identical trajectory
    # on identical random_state.  O(n·k) host, same as the returned embedding.
    z0 = rng.rand(n, k)
    z0 /= z0.sum(axis=1, keepdims=True)
    bh = block_docs if not use_pallas else None  # uniform height (SELL path)
    pad = (lambda a: _pad_block_rows(a, bh)) if bh else (lambda a: a)
    zd_blocks = [jnp.asarray(pad(z0[lo:hi].astype(np.float32)))
                 for lo, hi in store.block_rows]
    if sample_weight is not None and np.any(np.asarray(sample_weight) != 1.0):
        sw = np.asarray(sample_weight, np.float32)
        w_blocks = [jnp.asarray(pad(sw[lo:hi])) for lo, hi in store.block_rows]
    else:
        # ones for the real rows, ZERO-padded like the weighted branch: the
        # repo-wide invariant is "padding rows are absorbing = zero weight"
        # (padded doc rows are never referenced by packed entries today, but
        # a ones-weighted pad would silently matter if w ever entered a
        # per-doc term)
        w_blocks = [jnp.asarray(pad(np.ones(hi - lo, np.float32)))
                    for lo, hi in store.block_rows]

    n_iter = int(n_iter)
    if n_iter < 1:
        return z0.astype(np.float32)
    npt = max(int(n_iter_per_test), 1)

    # chunk layout: [1..1], [2..1+npt], [2+npt..1+2npt], ... — each chunk's
    # first iteration yields LL(state at the preceding test point)
    chunks = [(1, 1)]
    a = 2
    while a <= n_iter:
        chunks.append((a, min(a + npt - 1, n_iter)))
        a = chunks[-1][1] + 1

    prev_ll = None
    for a, b_end in chunks:
        if a >= 2:
            # state entering this chunk is state_{a-1} — the pending test point
            saved = [np.asarray(zb) for zb in zd_blocks]
        ll_acc = jnp.float32(0.0)
        for bi in range(store.n_blocks):
            dev = ship(store.blocks[bi])     # one H2D per block per chunk
            zd_b = zd_blocks[bi]
            for t in range(a, b_end + 1):
                zd_b, ll_b = doc_update(dev, zd_b, wz, w_blocks[bi],
                                        store.blocks[bi])
                if t == a:
                    ll_acc = ll_acc + ll_b   # LL(state_{a-1})
            zd_blocks[bi] = zd_b
        cur = float(ll_acc)
        if a == 1:
            prev_ll = cur                    # LL(init state)
        else:
            change = abs(cur - prev_ll)
            if change == 0.0 or change / abs(cur) < tolerance:
                return np.vstack(saved)[:n]  # state AT the converged test point
            prev_ll = cur
    # a test point landing exactly on n_iter changes no returned state
    # (converged or not, the dense path returns state_{n_iter}) — no extra pass
    return np.vstack([np.asarray(zb) for zb in zd_blocks])[:n]
