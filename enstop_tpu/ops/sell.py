"""Sparse O(nnz) EM path: dual sorted padded-segment ("SELL") layout.

The dense-block layout (ops/data.py) streams the full ``n x m`` rectangle every
iteration — at 20NG's 0.57% density that is ~175x the arithmetically necessary
work and caps corpora at what fits dense.  This module stores the corpus as the
reference does — by its nonzeros (``/root/reference/enstop/plsa.py:25-386``
operates on COO; memory and compute scale with nnz) — in a layout XLA/TPU can
vectorize:

* **doc-major**: each document's nonzeros are split into fixed-width ``L``
  segments (ELLPACK with row splitting, a.k.a. sliced-ELL).  Arrays
  ``row_doc (R,)``, ``cols (R, L)``, ``vals (R, L)``; padding lanes carry
  ``vals == 0`` (absorbing through every update) and padding rows carry doc 0
  with zero vals.
* **word-major**: the same entries sorted by word — ``col_word (R2,)``,
  ``rows (R2, L)``, ``vals (R2, L)``.

One EM iteration is two passes (the reference's M-step scatter duality:
``P(z|d)`` accumulates per-doc, ``P(w|z)`` per-word — plsa.py:110-204):

  pass 1 (doc-major):  gather ``wz.T[cols]`` -> s -> r = x/s ->
                       per-segment contribution -> sorted segment-sum by doc
  pass 2 (word-major): gather ``zd[rows]``  -> s -> r -> segment-sum by word

Gathers are embedding-style row lookups from ``(m, k)`` / ``(n, k)`` tables;
segment sums are sorted-segment reductions (gather-form via a precomputed
segment-index table, or ``jax.ops.segment_sum`` — selected by measurement).

``e_step_thresh`` is honored **exactly** here (the fast matmul paths treat it as
a numerical no-op): the reference drops unnormalized products
``P(w|z)P(z|d) <= thresh`` from both the numerator and the normalizer
(plsa.py:97-102); with the per-topic products materialized per entry this is a
mask before the normalize.  The ensemble's ``e_step_thresh=1e-16``
(enstop_.py:100,112,432) therefore has a first-class execution path.

Sample-weight asymmetry preserved: the weight multiplies only the ``P(w|z)``
accumulation (pass 2) and never ``P(z|d)`` (plsa.py:292-300).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .data import round_up

_TINY = 1e-30

DEFAULT_LANE = 128


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------

class SellSides:
    """Host (numpy) dual-sorted SELL arrays for a CSR corpus."""

    __slots__ = (
        "row_doc", "cols_a", "vals_a",          # doc-major
        "col_word", "rows_b", "vals_b",         # word-major
        "doc_segs", "word_segs",                # gather-form segment tables
        "n", "m", "nnz", "lane",
    )

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _bucket_rows(R):
    """Round a segment-row count up to a coarse bucket: the next multiple of
    max(128, 2^(floor(log2 R)-4)).  Worst-case padding is ~1/16 ≈ 6%
    asymptotically (granularity is between R/32 and R/16) and up to ~12%
    just above the 128-row floor crossover.

    Compiled program shapes are keyed on these padded counts; fine-grained
    (multiple-of-8) padding made every similar-but-not-identical corpus —
    bootstrap resamples, streamed blocks, repeated fits, serving batches —
    its own shape and its own 30s-10min remote compile (the relay charges
    small programs the same).  Coarse buckets collapse them onto shared
    shapes for a bounded sliver of absorbing padding rows; the 128-row
    floor costs at most ~64 KB of padding at the widest lane."""
    R = max(int(R), 8)
    return round_up(R, max(128, 1 << max(R.bit_length() - 5, 0)))


def pad_rows(arr, target_rows):
    """Zero-pad a host array's leading axis up to ``target_rows`` (the shared
    absorbing-row padder: segment rows carry owner 0 / zero vals, doc rows
    are never referenced by any packed entry)."""
    r = arr.shape[0]
    if r == target_rows:
        return arr
    pad = np.zeros((target_rows - r,) + arr.shape[1:], arr.dtype)
    return np.concatenate([np.asarray(arr), pad])


def _pack_one_side(indptr, indices, data, n_rows, lane, build_table=False):
    """Split each CSR row's nonzeros into ``lane``-wide segments.

    Returns ``(owner (R,), idx (R, L), val (R, L), seg_table)``.  The
    gather-form ``seg_table (n_rows, S)`` (padded with ``R``) is built only on
    request: its width is the MAX segments of any row, which explodes on
    Zipf-skewed sides (one 1.5M-entry word -> a 141k x 12k table); the scatter
    segment-sum needs no table and is the default.
    """
    nnz_r = np.diff(indptr).astype(np.int64)
    segs_r = -(-nnz_r // lane)  # ceil; 0 for empty rows
    R = int(segs_r.sum())
    R_pad = _bucket_rows(R)

    owner = np.zeros(R_pad, np.int32)
    idx = np.zeros((R_pad, lane), np.int32)
    val = np.zeros((R_pad, lane), np.float32)

    if R:
        seg_base = np.concatenate([[0], np.cumsum(segs_r)])[:-1]
        from .. import native

        if not native.sell_pack_side(indptr, indices, data, seg_base, lane,
                                     owner, idx, val):
            # numpy fallback: one fancy-index scatter over all nnz
            owner[:R] = np.repeat(np.arange(n_rows, dtype=np.int32), segs_r)
            nnz = int(indptr[-1])
            row_of = np.repeat(np.arange(n_rows, dtype=np.int64), nnz_r)
            within = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1].astype(np.int64), nnz_r)
            seg_row = seg_base[row_of] + within // lane
            lane_pos = within % lane
            idx[seg_row, lane_pos] = indices.astype(np.int32)
            val[seg_row, lane_pos] = data.astype(np.float32)

    if not build_table:
        return owner, idx, val, None
    return owner, idx, val, _seg_table(segs_r, n_rows, R, R_pad)


def _seg_table(segs_r, n_rows, R, R_pad):
    """Gather-form segment table: seg_table[d, j] = j-th segment row of d,
    else R_pad (the appended zero row)."""
    S = max(int(segs_r.max()) if R else 1, 1)
    seg_table = np.full((n_rows, S), R_pad, np.int32)
    if R:
        seg_base = np.concatenate([[0], np.cumsum(segs_r)])[:-1]
        for_rows = np.repeat(np.arange(n_rows, dtype=np.int64), segs_r)
        j = np.arange(R, dtype=np.int64) - seg_base[for_rows]
        seg_table[for_rows, j] = np.arange(R, dtype=np.int32)
    return seg_table


def _pack_word_side_fused(Xcsr, m, lane, build_table):
    """Word-major side straight from CSR via the native counting-sort
    transpose (no ``tocsc`` materialization).  None -> caller falls back."""
    from .. import native

    counts = np.bincount(Xcsr.indices, minlength=m).astype(np.int64)
    segs_r = -(-counts // lane)
    R = int(segs_r.sum())
    R_pad = _bucket_rows(R)
    owner = np.zeros(R_pad, np.int32)
    idx = np.zeros((R_pad, lane), np.int32)
    val = np.zeros((R_pad, lane), np.float32)
    if R:
        seg_base = np.concatenate([[0], np.cumsum(segs_r)])[:-1]
        if not native.sell_pack_word_side_from_csr(
            Xcsr.indptr, Xcsr.indices, Xcsr.data, seg_base, lane,
            owner, idx, val,
        ):
            return None
    table = _seg_table(segs_r, m, R, R_pad) if build_table else None
    return owner, idx, val, table


def _auto_lane(nnz, n_rows):
    """Segment width near the average row occupancy: wide lanes waste host and
    device memory on sparse rows (a 1-entry word still owns a full lane row)."""
    if n_rows == 0:
        return 8
    avg = max(nnz // max(n_rows, 1), 1)
    lane = 8
    while lane < min(avg, DEFAULT_LANE):
        lane *= 2
    return lane


def pack_sell(X, lane=None, build_tables=False, lane_words=None):
    """Pack a scipy sparse matrix into dual-sorted SELL arrays (host-side).

    ``lane=None`` picks each side's segment width from its average row
    occupancy (docs/words per row differ by orders of magnitude).  ``lane``
    forces the doc side (and the word side too unless ``lane_words`` is
    given) — sharded packers use the pair to unify lane widths across shards
    without collapsing the two sides to one max.
    ``build_tables`` adds the gather-form segment tables (only needed for
    ``segsum="gather"``; see :func:`_pack_one_side` for the size caveat)."""
    from scipy.sparse import issparse, csr_matrix

    if not issparse(X):
        X = csr_matrix(np.asarray(X))
    Xcsr = X.tocsr()
    Xcsr.sum_duplicates()
    n, m = Xcsr.shape

    lane_docs = lane or _auto_lane(Xcsr.nnz, n)
    lane_words = lane_words or lane or _auto_lane(Xcsr.nnz, m)
    row_doc, cols_a, vals_a, doc_segs = _pack_one_side(
        Xcsr.indptr, Xcsr.indices, Xcsr.data, n, lane_docs, build_tables
    )
    word = _pack_word_side_fused(Xcsr, m, lane_words, build_tables)
    if word is None:
        Xcsc = Xcsr.tocsc()
        word = _pack_one_side(
            Xcsc.indptr, Xcsc.indices, Xcsc.data, m, lane_words, build_tables
        )
    col_word, rows_b, vals_b, word_segs = word
    return SellSides(
        row_doc=row_doc, cols_a=cols_a, vals_a=vals_a,
        col_word=col_word, rows_b=rows_b, vals_b=vals_b,
        doc_segs=doc_segs, word_segs=word_segs,
        n=n, m=m, nnz=int(Xcsr.nnz), lane=lane_docs,
    )


# ---------------------------------------------------------------------------
# device-side EM step
# ---------------------------------------------------------------------------

def _segsum_gather(contrib, seg_table):
    """Sorted segment-sum via the gather-form table: append a zero row, gather
    each owner's segment rows, reduce.  (R+pad, k), (n, S) -> (n, k)."""
    padded = jnp.concatenate([contrib, jnp.zeros((1,) + contrib.shape[1:], contrib.dtype)])
    return padded[seg_table].sum(axis=1)


def _segsum_scatter(contrib, owner, num_segments):
    return jax.ops.segment_sum(
        contrib, owner, num_segments=num_segments, indices_are_sorted=True
    )


def _pass_contrib(table_side, idx2d, vals, factor_side, thresh):
    """Shared math of both passes.

    ``table_side``: (R, k) rows of the segment-owner factor (gathered once per
    segment row); ``idx2d``: (R, L) indices into ``factor_side`` (n_other, k);
    ``vals``: (R, L) counts (optionally pre-multiplied by sample weight).

    Returns ``(contrib (R, k), s (R, L), gathered (R, L, k))`` where
    ``contrib[r] = sum_l r[l] * gathered[l]`` with the reference's exact
    thresholded responsibilities when ``thresh`` fires.
    """
    g = factor_side[idx2d]                                  # (R, L, k) gather
    if thresh is None:
        s = jnp.einsum("rk,rlk->rl", table_side, g)         # (R, L)
        r = vals / jnp.maximum(s, _TINY)
        contrib = jnp.einsum("rl,rlk->rk", r, g)
        return contrib, s
    # exact reference semantics (plsa.py:97-102): products <= thresh drop from
    # numerator and normalizer
    v = table_side[:, None, :] * g                          # (R, L, k)
    v = jnp.where(v > thresh, v, 0.0)
    s_t = v.sum(axis=2)                                     # thresholded normalizer
    x_over_s = vals / jnp.maximum(s_t, _TINY)
    contrib = jnp.einsum("rl,rlk->rk", x_over_s, v)
    # NB: with thresholding, contrib already includes the table_side factor —
    # callers must NOT multiply by the old factor again.
    s = jnp.einsum("rk,rlk->rl", table_side, g)             # unthresholded, for LL
    return contrib, s


def em_step_sell(
    dev, zd, wz, w=None, thresh=None, compute_ll=True, segsum="scatter"
):
    """One exact EM step on SELL device arrays.

    ``dev``: dict of device arrays (see :func:`device_arrays`).
    ``thresh``: None for the fast r-form, or a float for the reference's exact
    ``e_step_thresh`` semantics.
    """
    n, k = zd.shape
    m = wz.shape[1]
    if segsum == "gather" and "doc_segs" not in dev:
        raise ValueError(
            "segsum='gather' needs the gather-form segment tables; pack with "
            "pack_sell(build_tables=True) / prepare_sell(build_tables=True)"
        )
    wzT = wz.T  # (m, k)

    # ---- pass 1 (doc-major): P(z|d) numerator + LL --------------------------
    zd_rows = zd[dev["row_doc"]]                            # (R, k)
    contrib, s = _pass_contrib(zd_rows, dev["cols_a"], dev["vals_a"], wzT, thresh)
    if segsum == "gather":
        B = _segsum_gather(contrib, dev["doc_segs"])        # (n, k)
    else:
        B = _segsum_scatter(contrib, dev["row_doc"], n)
    if thresh is None:
        num_zd = zd * B
    else:
        num_zd = B                                           # zd already inside
    next_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)

    if compute_ll:
        term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
        if w is not None:
            term = term * w[dev["row_doc"]][:, None]
        ll = term.sum()
    else:
        ll = jnp.float32(0.0)

    # ---- pass 2 (word-major): P(w|z) numerator ------------------------------
    wz_rows = wzT[dev["col_word"]]                          # (R2, k)
    vals_b = dev["vals_b"]
    if w is not None:
        vals_b = vals_b * w[dev["rows_b"]]                  # weight on P(w|z) only
    contrib2, _ = _pass_contrib(wz_rows, dev["rows_b"], vals_b, zd, thresh)
    if segsum == "gather":
        A_T = _segsum_gather(contrib2, dev["word_segs"])    # (m, k)
    else:
        A_T = _segsum_scatter(contrib2, dev["col_word"], m)
    if thresh is None:
        num_wz = wz * A_T.T
    else:
        num_wz = A_T.T
    next_wz = num_wz / jnp.maximum(num_wz.sum(axis=1, keepdims=True), _TINY)

    return next_zd, next_wz, ll


def refit_step_sell(dev, zd, wz, w=None, thresh=None, compute_ll=True, segsum="scatter"):
    """Frozen-topics step: only pass 1 (reference plsa.py:733-816)."""
    n, k = zd.shape
    if segsum == "gather" and "doc_segs" not in dev:
        raise ValueError(
            "segsum='gather' needs the gather-form segment tables; pack with "
            "pack_sell(build_tables=True) / prepare_sell(build_tables=True)"
        )
    wzT = wz.T
    zd_rows = zd[dev["row_doc"]]
    contrib, s = _pass_contrib(zd_rows, dev["cols_a"], dev["vals_a"], wzT, thresh)
    if segsum == "gather":
        B = _segsum_gather(contrib, dev["doc_segs"])
    else:
        B = _segsum_scatter(contrib, dev["row_doc"], n)
    num_zd = (zd * B) if thresh is None else B
    next_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)
    if compute_ll:
        term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
        if w is not None:
            term = term * w[dev["row_doc"]][:, None]
        ll = term.sum()
    else:
        ll = jnp.float32(0.0)
    return next_zd, ll


def log_likelihood_sell(dev, zd, wz, w=None):
    """LL over nonzeros (reference plsa.py:313-386; never thresholded)."""
    wzT = wz.T
    zd_rows = zd[dev["row_doc"]]
    g = wzT[dev["cols_a"]]
    s = jnp.einsum("rk,rlk->rl", zd_rows, g)
    term = dev["vals_a"] * jnp.log(jnp.maximum(s, _TINY))
    if w is not None:
        term = term * w[dev["row_doc"]][:, None]
    return term.sum()


def device_arrays(sides: SellSides):
    """Ship the packed arrays to the default device once (gather-form segment
    tables only when they were built — see :func:`pack_sell`)."""
    dev = {
        "row_doc": jax.device_put(jnp.asarray(sides.row_doc)),
        "cols_a": jax.device_put(jnp.asarray(sides.cols_a)),
        "vals_a": jax.device_put(jnp.asarray(sides.vals_a)),
        "col_word": jax.device_put(jnp.asarray(sides.col_word)),
        "rows_b": jax.device_put(jnp.asarray(sides.rows_b)),
        "vals_b": jax.device_put(jnp.asarray(sides.vals_b)),
    }
    if sides.doc_segs is not None:
        dev["doc_segs"] = jax.device_put(jnp.asarray(sides.doc_segs))
        dev["word_segs"] = jax.device_put(jnp.asarray(sides.word_segs))
    return dev


# ---------------------------------------------------------------------------
# fit drivers
# ---------------------------------------------------------------------------

class PreparedSell:
    """Device-resident sparse corpus reusable across fits (sparse analog of
    :class:`enstop_tpu.ops.driver.PreparedCounts`).

    ``kind`` selects the execution layout: ``"sell"`` (XLA gathers/segment
    sums — the default everywhere, see :func:`prepare_sell`) or ``"chunks"``
    (the fused Pallas one-hot-matmul kernels of ops/pallas_sell.py — opt-in;
    measured at best on par with SELL and SMEM-capped ~100k chunks)."""

    __slots__ = ("dev", "n", "m", "nnz", "lane", "backend", "kind", "meta", "src")

    def __init__(self, dev, n, m, nnz, lane, kind="sell", meta=None, src=None):
        self.dev = dev
        self.n = n
        self.m = m
        self.nnz = nnz
        self.lane = lane
        self.backend = "sparse"
        self.kind = kind
        self.meta = meta
        # host-side source handle (a reference, not a copy): lets the SELL
        # path fall back to the chunk layout if the compiler rejects the
        # SELL program at extreme scale (observed: remote HTTP 500 at 19M
        # rows — docs/PERFORMANCE.md §sparse)
        self.src = src

    @property
    def shape(self):
        return (self.n, self.m)


def prepare_sell(X, lane=None, standardize=True, kind="auto", bd=None, bw=None,
                 build_tables=False):
    """Pack + ship a corpus once for repeated sparse fits.

    ``kind="auto"`` uses the XLA SELL layout (measured default);
    ``kind="chunks"`` selects the fused Pallas chunk kernels with optional
    ``bd``/``bw`` tile shapes — larger tiles (2048x2048 measured best) keep
    the chunk count under the SMEM scalar-prefetch ceiling on huge corpora
    (config C, 250k x 141k, 19M nnz, runs at 515-709 ms/iter where the dense
    rectangle cannot fit and this environment's remote compiler rejects the
    19M-row SELL program — docs/PERFORMANCE.md)."""
    if standardize:
        from ..utils import standardize_input

        X = standardize_input(X)
    if kind == "auto":
        # measured on v5e (scripts/bench_sparse.py): with adaptive lanes the
        # XLA SELL path matches or beats the Pallas chunk kernels (20.5 vs
        # 22.8 ms at 20NG shape, 23 vs 88 ms at 141k vocab) and has no SMEM
        # scalar-prefetch ceiling (the chunk kernels top out ~100k chunks);
        # chunks stay available via kind="chunks"
        kind = "sell"
    if kind == "chunks":
        from . import pallas_sell as ps

        kw = {}
        if bd is not None:
            kw["bd"] = int(bd)
        if bw is not None:
            kw["bw"] = int(bw)
        ch = ps.pack_chunks(X, **kw)
        return PreparedSell(
            ps.device_chunks(ch), ch.n, ch.m, ch.nnz, ch.chunk,
            kind="chunks", meta=(ch.bd, ch.bw, ch.n_pad, ch.m_pad),
        )
    sides = pack_sell(X, lane=lane, build_tables=build_tables)
    return PreparedSell(device_arrays(sides), sides.n, sides.m, sides.nnz,
                        sides.lane, kind="sell", src=X)


@lru_cache(maxsize=32)
def _build_sell_fit(refit, thresholded, segsum, dev_struct, kind="sell",
                    thresh_value=None, meta=None):
    """One compiled while-loop program per (refit, thresholded, segsum/kind,
    dev-array-shapes); iteration counts / tolerance are traced.  For the
    Pallas chunk kind the threshold is baked statically (one program per
    distinct threshold — in practice 1e-16 and "off")."""
    del dev_struct  # only keys the cache on array shapes
    from .fit import em_fit_loop

    if kind == "chunks":
        from . import pallas_sell as ps

        bd, bw, n_pad, m_pad = meta
        th = thresh_value if thresholded else None

        @jax.jit
        def run(dev, zd, wz, w, thresh, tol, n_iter, npt):
            if refit:
                def step(state):
                    new_zd, ll = ps.refit_step_chunks(
                        dev, state[0], state[1], w=w, thresh=th,
                        compute_ll=False, bd=bd, bw=bw,
                        n_pad=n_pad, m_pad=m_pad,
                    )
                    return (new_zd, state[1]), ll
            else:
                def step(state):
                    new_zd, new_wz, ll = ps.em_step_chunks(
                        dev, state[0], state[1], w=w, thresh=th,
                        compute_ll=False, bd=bd, bw=bw,
                        n_pad=n_pad, m_pad=m_pad,
                    )
                    return (new_zd, new_wz), ll

            def ll_of(state):
                return ps.log_likelihood_chunks(
                    dev, state[0], state[1], w=w, bd=bd, bw=bw,
                    n_pad=n_pad, m_pad=m_pad,
                )

            res = em_fit_loop(step, ll_of, (zd, wz), n_iter, npt, tol)
            return (res.state[0], res.state[1], res.n_steps, res.final_ll,
                    res.ll_trace, res.n_tests)

        from ..aot_cache import maybe_wrap

        return maybe_wrap(run, name=f"chunksfit-{'refit' if refit else 'em'}")

    @jax.jit
    def run(dev, zd, wz, w, thresh, tol, n_iter, npt):
        th = thresh if thresholded else None

        if refit:
            def step(state):
                new_zd, ll = refit_step_sell(
                    dev, state[0], state[1], w=w, thresh=th,
                    compute_ll=False, segsum=segsum,
                )
                return (new_zd, state[1]), ll
        else:
            def step(state):
                new_zd, new_wz, ll = em_step_sell(
                    dev, state[0], state[1], w=w, thresh=th,
                    compute_ll=False, segsum=segsum,
                )
                return (new_zd, new_wz), ll

        def ll_of(state):
            return log_likelihood_sell(dev, state[0], state[1], w=w)

        res = em_fit_loop(step, ll_of, (zd, wz), n_iter, npt, tol)
        return res.state[0], res.state[1], res.n_steps, res.final_ll, res.ll_trace, res.n_tests

    from ..aot_cache import maybe_wrap

    return maybe_wrap(run, name=f"sellfit-{'refit' if refit else 'em'}")


def _dev_struct(dev):
    def item(v):
        if isinstance(v, dict):
            return _dev_struct(v)
        return (v.shape, str(v.dtype))

    return tuple(sorted((k, item(v)) for k, v in dev.items()))


# The fast paths document e_step_thresh <= this as a numerical no-op; above it
# (the ensemble's 1e-16 and anything larger) the exact masked form runs.
THRESH_MATERIAL = 1e-30


def _bucket_doc_inputs(prep, segsum, p_z_given_d, sample_weight):
    """Pad the doc-indexed inputs (``zd``, ``w``) to a bucketed row count so
    fits/refits on similar-sized corpora (serving ``transform`` batches)
    share compiled programs: the scatter segment-sum takes its height from
    ``zd.shape[0]`` and the padding rows are never referenced by any packed
    entry, so the trajectory is bit-unchanged.  The gather-form segsum and
    the chunk layout size their outputs from pack-time metadata instead —
    those run unpadded.

    Padding happens with jnp ops: device-resident inputs (the ensemble's
    on-device generated inits) must NOT round-trip through the host — a
    blocking D2H per run would re-serialize the pipelined run dispatch."""
    zd = jnp.asarray(p_z_given_d, jnp.float32)
    w = (jnp.asarray(sample_weight, jnp.float32)
         if sample_weight is not None else jnp.ones(prep.n, jnp.float32))
    n_pad = (_bucket_rows(prep.n)
             if (prep.kind == "sell" and segsum == "scatter") else prep.n)
    if n_pad != prep.n:
        zd = jnp.concatenate(
            [zd, jnp.zeros((n_pad - prep.n, zd.shape[1]), jnp.float32)])
        w = jnp.concatenate([w, jnp.zeros(n_pad - prep.n, jnp.float32)])
    return zd, w, n_pad


def _fallback_to_chunks(prep, err, first_use=True):
    """Repack a SELL corpus as Pallas chunks after a compile rejection.

    At extreme scale this environment's compiler can reject the SELL program
    (observed: remote HTTP 500 at 19M rows) while the auto-tiled chunk
    kernels still compile.  The prepared corpus is mutated IN PLACE so every
    later fit/refit on it (ensemble runs, fit_transform + transform) goes
    straight to chunks without re-paying the failed compile.

    Only COMPILE-phase failures trigger the fallback; execution-phase
    failures (e.g. transient relay death mid-run raises XlaRuntimeError, a
    RuntimeError subclass) must surface unchanged — repacking a 19M-nnz
    corpus and retrying on an equally-dead device would cost minutes and
    mask the real error.  Two gates:

    * ``first_use=False`` (this exact program has executed successfully
      before in this process) — a compile rejection is impossible, so any
      error is execution-phase: re-raise.
    * known execution-phase message markers (result-readback failures).

    Trace-time user errors (wrong shapes/dtypes raise TypeError/ValueError)
    are excluded by the RuntimeError check as before."""
    import warnings

    if not isinstance(err, RuntimeError):
        return False
    if not first_use:
        return False  # program ran before: cannot be a compile rejection
    # Execution/transport-phase markers: result-readback failures and dead-
    # relay transport errors.  ``first_use`` means "never dispatched", not
    # "never executed" (dispatch is async), so an async execution failure on
    # the first call still lands here — these markers keep it from
    # triggering a minutes-long repack against a possibly-dead device
    # (ADVICE r04).
    msg = str(err).lower()
    # Deliberately broad (e.g. bare "unavailable"/"transport"): the cost
    # asymmetry favors it.  A compile rejection misread as execution-phase
    # surfaces a raw error the user can retry with kind='chunks'; a transport
    # error misread as a compile rejection triggers a host repack plus a
    # fresh compile against a dead device, which hangs for minutes.
    _EXEC_PHASE_MARKERS = (
        "buffer definition event",   # result-readback failure
        "deadline_exceeded", "deadline exceeded",
        "unavailable",
        "socket closed", "connection reset", "connection refused",
        "broken pipe", "transport",
    )
    if any(m in msg for m in _EXEC_PHASE_MARKERS):
        return False
    if prep.kind != "sell" or prep.src is None:
        return False
    warnings.warn(
        "sparse SELL program failed to compile ({}: {}); retrying with the "
        "Pallas chunk layout (kind='chunks', auto-tiled)".format(
            type(err).__name__, str(err)[:200]
        )
    )
    try:
        repacked = prepare_sell(prep.src, standardize=False, kind="chunks")
    except Exception:
        return False
    prep.dev = repacked.dev
    prep.lane = repacked.lane
    prep.kind = repacked.kind
    prep.meta = repacked.meta
    prep.src = None  # no further fallback from chunks: release the host pin
    return True


def sell_fit(
    prep: PreparedSell,
    p_z_given_d,
    p_w_given_z,
    sample_weight=None,
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=1e-32,
    segsum="scatter",
):
    """EM fit on a prepared SELL corpus.  Returns
    ``(zd, wz, n_steps, final_ll, ll_trace, n_tests)`` (device arrays).

    If the SELL program fails to compile at extreme scale, the corpus is
    transparently repacked to the chunk layout and the fit retried (see
    :func:`_fallback_to_chunks`)."""
    thresholded = e_step_thresh is not None and e_step_thresh > THRESH_MATERIAL

    ctx = {"first_use": True}

    def attempt():
        zd_a, w_a, n_pad = _bucket_doc_inputs(
            prep, segsum, p_z_given_d, sample_weight)
        run = _build_sell_fit(
            False, thresholded, segsum, _dev_struct(prep.dev), kind=prep.kind,
            thresh_value=float(e_step_thresh) if thresholded else None,
            meta=prep.meta,
        )
        ctx["first_use"] = not getattr(run, "_ran_ok", False)
        out = run(
            prep.dev, zd_a, jnp.asarray(p_w_given_z), w_a,
            jnp.float32(e_step_thresh or 0.0), jnp.float32(tolerance),
            jnp.int32(n_iter), jnp.int32(n_iter_per_test),
        )
        run._ran_ok = True  # dispatched: later errors are execution-phase
        if n_pad != prep.n:
            out = (out[0][: prep.n],) + tuple(out[1:])
        return out

    # NB: prep.src (the caller's scipy matrix, held by reference — no copy)
    # stays pinned even after a successful fit: a later call on the same
    # prepared corpus with a different k / threshold / refit is a SEPARATE
    # compile that can still be rejected and need the chunks fallback.
    try:
        return attempt()
    except Exception as err:
        if not _fallback_to_chunks(prep, err, ctx["first_use"]):
            raise
        return attempt()


def sell_refit(
    prep: PreparedSell,
    p_z_given_d,
    topics,
    sample_weight=None,
    n_iter=50,
    n_iter_per_test=10,
    tolerance=0.005,
    e_step_thresh=1e-32,
    segsum="scatter",
):
    """Frozen-topics refit on a prepared SELL corpus; returns the same tuple.
    Falls back to the chunk layout on a compile rejection, like sell_fit."""
    thresholded = e_step_thresh is not None and e_step_thresh > THRESH_MATERIAL

    ctx = {"first_use": True}

    def attempt():
        zd_a, w_a, n_pad = _bucket_doc_inputs(
            prep, segsum, p_z_given_d, sample_weight)
        run = _build_sell_fit(
            True, thresholded, segsum, _dev_struct(prep.dev), kind=prep.kind,
            thresh_value=float(e_step_thresh) if thresholded else None,
            meta=prep.meta,
        )
        ctx["first_use"] = not getattr(run, "_ran_ok", False)
        out = run(
            prep.dev, zd_a, jnp.asarray(topics), w_a,
            jnp.float32(e_step_thresh or 0.0), jnp.float32(tolerance),
            jnp.int32(n_iter), jnp.int32(n_iter_per_test),
        )
        run._ran_ok = True  # dispatched: later errors are execution-phase
        if n_pad != prep.n:
            out = (out[0][: prep.n],) + tuple(out[1:])
        return out

    try:
        return attempt()
    except Exception as err:
        if not _fallback_to_chunks(prep, err, ctx["first_use"]):
            raise
        return attempt()
