"""Fused Pallas TPU kernels for sparse O(nnz) pLSA EM: tile-local one-hot matmuls.

TPU vector units have no efficient arbitrary gather/scatter, which is why the
pure-XLA SELL path (ops/sell.py) runs far from the bandwidth roofline.  These
kernels remove every gather/scatter by exploiting a 2D-sorted chunk layout:

* nonzeros are sorted by tile — ``(word_block, doc_block)`` for the P(w|z)
  pass, ``(doc_block, word_block)`` for the P(z|d) pass — and packed into
  fixed-size chunks of ``C`` entries carrying *tile-local* doc/word ids;
* inside the kernel, the "gathers" become two small one-hot matrices built by
  an iota-compare (``C x Bd`` and ``C x Bw``) and MXU matmuls:

      zd_g = onehot_d @ zd_tile          gather P(z|d) rows        (C, k)
      wz_g = onehot_w @ wzT_tile         gather P(w|z) columns     (C, k)
      s    = rowsum(zd_g * wz_g)         per-entry normalizer      (C,)
      acc += onehot^T @ contrib          scatter-by-matmul         (B*, k)

  with ``r = x / max(s, tiny)``.
* each pass's accumulator block is VMEM-resident across its consecutive chunk
  run and written exactly once — no aliased read-modify-write traffic at all.

This is the TPU-native replacement for the reference's COO kernels
(``/root/reference/enstop/plsa.py:25-386``) at their own O(nnz) complexity:
compute and memory scale with the nonzeros, not the ``n x m`` rectangle.  The
refit path (frozen topics, plsa.py:733-816) is the doc pass alone.

``e_step_thresh`` is honored exactly (``thresholded=True``): per-entry
per-topic products ``v = zd_g * wz_g`` are masked at the threshold before the
normalizer, matching plsa.py:97-102 (and ops/coo.py / ops/sell.py); the
log-likelihood always uses the unmasked normalizer (plsa.py:313-386).

Weighted M-step asymmetry preserved: the per-doc weight (gathered through the
same one-hot) multiplies only the P(w|z) contribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .data import round_up

_TINY = 1e-30

DEFAULT_CHUNK = 1024
DEFAULT_BD = 512
DEFAULT_BW = 512
_VMEM_BUDGET = 96 * 1024 * 1024


# ---------------------------------------------------------------------------
# host-side chunk packing
# ---------------------------------------------------------------------------

class ChunkSide:
    """One sort order's chunk arrays."""

    __slots__ = ("rows_local", "cols_local", "vals", "chunk_i", "chunk_j",
                 "first_of_major", "n_chunks")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class SellChunks:
    """Dual-sorted chunk layout (see module docstring)."""

    __slots__ = ("word_major", "doc_major", "n", "m", "nnz",
                 "bd", "bw", "chunk", "n_pad", "m_pad")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _pack_one_order_native(rows32, cols32, vals32, bd, bw, n_ti, n_tj, major,
                           chunk):
    """Fully-native chunk packing: a C histogram over tile keys + a C fill
    pass computing local ids and chunk slots on the fly; only small per-tile
    arrays touch numpy.  Output is identical to :func:`_pack_one_order`
    (same (major, minor) ascending order, same coverage dummies, entries in
    original order within a tile).  Returns None -> caller falls back."""
    from .. import native

    major_is_j = major == "j"
    counts = native.chunk_histogram(rows32, cols32, bd, bw, n_ti, n_tj,
                                    major_is_j)
    if counts is None:
        return None
    n_keys = n_ti * n_tj
    n_minor = n_ti if major_is_j else n_tj
    n_major = n_tj if major_is_j else n_ti
    nonempty = counts > 0
    cpt = np.where(nonempty, -(-counts // chunk), 0)
    keys_ne = np.flatnonzero(nonempty)
    cpt_ne = cpt[keys_ne]
    real = int(cpt_ne.sum())
    major_of_key = np.arange(n_keys, dtype=np.int64) // n_minor
    present = np.zeros(n_major, bool)
    present[major_of_key[keys_ne]] = True
    missing = np.flatnonzero(~present).astype(np.int64)
    n_chunks = real + missing.shape[0]

    # final chunk sequence: stable sort by major (real chunks are already in
    # (major, minor) ascending key order; each dummy is alone in its major)
    seq_major = np.concatenate([np.repeat(major_of_key[keys_ne], cpt_ne),
                                missing])
    order2 = np.argsort(seq_major, kind="stable")
    inv2 = np.empty(n_chunks, np.int64)
    inv2[order2] = np.arange(n_chunks)
    base_pre = np.concatenate([[0], np.cumsum(cpt_ne)])[:-1].astype(np.int64)
    chunk_base = np.zeros(n_keys, np.int64)
    if real:
        chunk_base[keys_ne] = inv2[base_pre]

    if major_is_j:
        ti_k = np.arange(n_keys, dtype=np.int64) % n_ti
        tj_k = major_of_key
        dummy_i = np.zeros(missing.shape[0], np.int64)
        dummy_j = missing
    else:
        ti_k = major_of_key
        tj_k = np.arange(n_keys, dtype=np.int64) % n_tj
        dummy_i = missing
        dummy_j = np.zeros(missing.shape[0], np.int64)
    ci = np.concatenate([np.repeat(ti_k[keys_ne], cpt_ne), dummy_i])[order2]
    cj = np.concatenate([np.repeat(tj_k[keys_ne], cpt_ne), dummy_j])[order2]
    chunk_i = ci.astype(np.int32)
    chunk_j = cj.astype(np.int32)
    major_arr = chunk_j if major_is_j else chunk_i
    first = np.zeros(n_chunks, np.int32)
    if n_chunks:
        first[0] = 1
        first[1:] = (major_arr[1:] != major_arr[:-1]).astype(np.int32)

    rows_local = np.zeros((n_chunks, chunk), np.int32)
    cols_local = np.zeros((n_chunks, chunk), np.int32)
    vals_out = np.zeros((n_chunks, chunk), np.float32)
    if not native.chunk_fill(rows32, cols32, vals32, bd, bw, n_ti, n_tj,
                             major_is_j, chunk, chunk_base,
                             rows_local, cols_local, vals_out):
        return None
    return ChunkSide(
        rows_local=rows_local, cols_local=cols_local, vals=vals_out,
        chunk_i=chunk_i, chunk_j=chunk_j, first_of_major=first,
        n_chunks=n_chunks,
    )


def _pack_one_order(rows, cols, vals, ti, tj, n_blocks_major, major, chunk):
    """Sort by (major tile axis, minor tile axis), chunk, pad, add coverage
    dummies so every major block owns at least one chunk (zero-init safety)."""
    # sort by (major tile, minor tile): the tile key is a small integer, so a
    # native stable counting sort replaces the O(n log n) lexsort (the packer's
    # dominant cost at 10M+ nnz); np.lexsort remains the fallback
    from .. import native

    Mi = int(ti.max()) + 2 if ti.size else 2
    Mj = int(tj.max()) + 2 if tj.size else 2
    key_full = (tj.astype(np.int64) * Mi + ti) if major == "j" else (
        ti.astype(np.int64) * Mj + tj)
    order = None
    if ti.size:
        n_keys = (Mj - 1) * Mi + Mi if major == "j" else (Mi - 1) * Mj + Mj
        order = native.counting_sort_by_key(key_full, n_keys)
    if order is None:
        order = np.lexsort((ti, tj)) if major == "j" else np.lexsort((tj, ti))
    major_of = tj if major == "j" else ti
    rows, cols, vals = rows[order], cols[order], vals[order]
    ti, tj, major_of = ti[order], tj[order], major_of[order]

    # tile boundaries in sorted order
    key = key_full[order]
    boundaries = np.flatnonzero(np.diff(key)) + 1 if rows.size else np.array([], np.int64)
    starts = np.concatenate([[0], boundaries]).astype(np.int64)
    ends = np.concatenate([boundaries, [rows.shape[0]]]).astype(np.int64)
    counts = ends - starts
    chunks_per_tile = np.maximum(-(-counts // chunk), 1)

    # coverage: major blocks with no entries get one dummy tile (i=0 or j=0 minor)
    present = np.zeros(n_blocks_major, bool)
    if rows.size:
        present[major_of[starts]] = True
    missing = np.flatnonzero(~present)

    n_chunks = int(chunks_per_tile.sum()) + missing.shape[0]
    C = chunk
    rows_local = np.zeros((n_chunks, C), np.int32)
    cols_local = np.zeros((n_chunks, C), np.int32)
    vals_out = np.zeros((n_chunks, C), np.float32)
    chunk_i = np.zeros(n_chunks, np.int32)
    chunk_j = np.zeros(n_chunks, np.int32)

    if rows.size:
        tile_of_entry = np.repeat(np.arange(starts.shape[0]), counts)
        chunk_base = np.concatenate([[0], np.cumsum(chunks_per_tile)])[:-1]
        within = np.arange(rows.shape[0], dtype=np.int64) - starts[tile_of_entry]
        dest_chunk = chunk_base[tile_of_entry] + within // C
        dest_slot = within % C
        rows_local[dest_chunk, dest_slot] = rows.astype(np.int32)
        cols_local[dest_chunk, dest_slot] = cols.astype(np.int32)
        vals_out[dest_chunk, dest_slot] = vals
        real = int(chunks_per_tile.sum())
        chunk_i[:real] = np.repeat(ti[starts], chunks_per_tile).astype(np.int32)
        chunk_j[:real] = np.repeat(tj[starts], chunks_per_tile).astype(np.int32)
    else:
        real = 0
    # dummies for uncovered major blocks (all-zero vals are absorbing)
    if missing.shape[0]:
        if major == "j":
            chunk_j[real:] = missing.astype(np.int32)
        else:
            chunk_i[real:] = missing.astype(np.int32)

    # re-sort chunks so the major axis is non-decreasing (dummies included)
    major_arr = chunk_j if major == "j" else chunk_i
    order2 = np.argsort(major_arr, kind="stable")
    rows_local, cols_local, vals_out = rows_local[order2], cols_local[order2], vals_out[order2]
    chunk_i, chunk_j = chunk_i[order2], chunk_j[order2]
    major_arr = chunk_j if major == "j" else chunk_i

    first = np.zeros(n_chunks, np.int32)
    if n_chunks:
        first[0] = 1
        first[1:] = (major_arr[1:] != major_arr[:-1]).astype(np.int32)
    return ChunkSide(
        rows_local=rows_local, cols_local=cols_local, vals=vals_out,
        chunk_i=chunk_i, chunk_j=chunk_j, first_of_major=first,
        n_chunks=n_chunks,
    )


# the per-chunk scalar-prefetch arrays live in SMEM (~MB); grids beyond this
# many chunks fail to fit (measured ceiling ~100k chunks of 3 int32 scalars)
_SMEM_CHUNK_CAP = 90_000


def auto_tile_shape(n, m, nnz, bd=DEFAULT_BD, bw=DEFAULT_BW, chunk=None):
    """Grow (bd, bw) from the defaults until the worst-case chunk count
    (coverage tiles + entry chunks) fits the SMEM scalar-prefetch ceiling.
    2048x2048 measured best at 19M-nnz scale (docs/PERFORMANCE.md); growth
    stops at 4096 per side (larger tiles measured slower)."""
    C = chunk or DEFAULT_CHUNK

    def worst_chunks(bd_, bw_):
        tiles = (-(-n // bd_)) * (-(-m // bw_))
        return min(tiles, nnz) + -(-nnz // C)

    # target well under the ceiling (cap/3): beyond ~30k chunks the grid is
    # dominated by coverage dummies, which measured slower as well as risking
    # the SMEM limit; this lands on the measured-best 2048x2048 at config C
    # grow the smaller side first; a side stops at 4096 but the other keeps
    # growing (the loop guard ensures at least one side has room).  bw capped
    # forces bd < 4096 by the guard, so the two branches are exhaustive.
    while worst_chunks(bd, bw) > _SMEM_CHUNK_CAP // 3 and (bd < 4096 or bw < 4096):
        if bd < 4096 and (bd <= bw or bw >= 4096):
            bd *= 2
        else:
            bw *= 2
    if worst_chunks(bd, bw) > _SMEM_CHUNK_CAP:
        import warnings

        warnings.warn(
            "pack_chunks: corpus needs ~{} chunks even at {}x{} tiles, above "
            "the ~{} SMEM scalar-prefetch ceiling; the Pallas chunk kernel may "
            "fail to compile — use kind='sell' or a larger chunk size".format(
                worst_chunks(bd, bw), bd, bw, _SMEM_CHUNK_CAP
            )
        )
    return bd, bw


def pack_chunks(X, bd=None, bw=None, chunk=None):
    """Pack a (sparse or dense) count matrix into dual-sorted local-id chunks.

    ``chunk=None`` sizes chunks near the average tile occupancy, bounding the
    zero-fill waste on sparse tile grids.  ``bd``/``bw`` default to 512 and
    auto-grow on huge corpora whose tile grid would exceed the SMEM
    scalar-prefetch ceiling (see :func:`auto_tile_shape`)."""
    from scipy.sparse import issparse, csr_matrix

    if bd is None or bw is None:
        n_, m_ = X.shape
        nnz_ = X.nnz if issparse(X) else int(np.count_nonzero(np.asarray(X)))
        abd, abw = auto_tile_shape(n_, m_, nnz_, chunk=chunk)
        bd = bd if bd is not None else abd
        bw = bw if bw is not None else abw

    if chunk is None:
        # Mosaic requires >= 8 sublane rows per block, so the floor is
        # 8*128 = 1024 on real hardware; sizing beyond that tracks the average
        # tile occupancy to bound zero-fill on sparse tile grids.
        n, m = X.shape
        tiles = max((-(-n // bd)) * (-(-m // bw)), 1)
        nnz = X.nnz if issparse(X) else int(np.count_nonzero(np.asarray(X)))
        avg = nnz / tiles
        # hardware-validated chunk size; larger chunks trip Mosaic layout
        # bugs (vector<1x4096> multi_reduction INTERNAL errors on v5e)
        chunk = DEFAULT_CHUNK
        del avg
    if chunk % 128:
        raise ValueError("chunk size must be a multiple of 128 (lane width)")

    if not issparse(X):
        X = csr_matrix(np.asarray(X))
    coo = X.tocoo()
    coo.sum_duplicates()
    n, m = coo.shape
    n_pad, m_pad = round_up(n, bd), round_up(m, bw)
    n_ti, n_tj = n_pad // bd, m_pad // bw

    word_major = doc_major = None
    if coo.nnz:
        # fully-native two-pass packing (no nnz-sized numpy temporaries)
        r32 = np.ascontiguousarray(coo.row, dtype=np.int32)
        c32 = np.ascontiguousarray(coo.col, dtype=np.int32)
        v32 = np.ascontiguousarray(coo.data, dtype=np.float32)
        word_major = _pack_one_order_native(r32, c32, v32, bd, bw, n_ti, n_tj,
                                            "j", chunk)
        doc_major = _pack_one_order_native(r32, c32, v32, bd, bw, n_ti, n_tj,
                                           "i", chunk)
    if word_major is None or doc_major is None:
        rows = coo.row.astype(np.int64)
        cols = coo.col.astype(np.int64)
        vals = coo.data.astype(np.float32)
        ti = rows // bd
        tj = cols // bw
        rows_l = rows - ti * bd
        cols_l = cols - tj * bw
        word_major = _pack_one_order(rows_l, cols_l, vals, ti, tj, n_tj, "j", chunk)
        doc_major = _pack_one_order(rows_l, cols_l, vals, ti, tj, n_ti, "i", chunk)
    return SellChunks(
        word_major=word_major, doc_major=doc_major,
        n=n, m=m, nnz=int(coo.nnz), bd=bd, bw=bw, chunk=chunk,
        n_pad=n_pad, m_pad=m_pad,
    )


def device_chunks(ch: SellChunks):
    """Ship both chunk sides to the device once.

    Entry arrays are reshaped to ``(n_chunks * C/128, 128)`` — Mosaic requires
    the last two block dims to be multiples of (8, 128), so a chunk is
    addressed as ``C/128`` sublane rows of 128 lanes.
    """
    C = ch.chunk
    sub = C // 128

    def two_d(a):
        return jax.device_put(jnp.asarray(a.reshape(-1, 128)))

    def side(s):
        return {
            "rows": two_d(s.rows_local),
            "cols": two_d(s.cols_local),
            "vals": two_d(s.vals),
            "chunk_i": jax.device_put(jnp.asarray(s.chunk_i)),
            "chunk_j": jax.device_put(jnp.asarray(s.chunk_j)),
            "first": jax.device_put(jnp.asarray(s.first_of_major)),
        }

    return {"word_major": side(ch.word_major), "doc_major": side(ch.doc_major)}


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _interpret():
    return jax.default_backend() != "tpu"


def _onehot_2d(ids2d, width):
    """(sub, 128) int32 local ids -> (sub*128, width) f32 one-hot: per-sublane
    iota compares concatenated on the sublane axis (Mosaic-friendly)."""
    sub = ids2d.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, width), 1)
    pieces = [
        (iota == ids2d[s, :][:, None]).astype(jnp.float32) for s in range(sub)
    ]
    return pieces[0] if sub == 1 else jnp.concatenate(pieces, axis=0)


def _col_2d(vals2d):
    """(sub, 128) -> (sub*128, 1) column, row order matching :func:`_onehot_2d`."""
    sub = vals2d.shape[0]
    pieces = [vals2d[s, :][:, None] for s in range(sub)]
    return pieces[0] if sub == 1 else jnp.concatenate(pieces, axis=0)


def _make_dot(precision):
    return functools.partial(
        jax.lax.dot_general,
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if precision == "highest"
                   else jax.lax.Precision.DEFAULT),
    )


def _entry_terms(rows, cols, x, zd_blk, wzT_blk, w_blk, thresh, precision):
    """Shared per-chunk math.  ``rows``/``cols``/``x`` are (sub, 128) chunk
    tiles; everything downstream works on (C, ...) = (sub*128, ...).

    ``precision="default"`` runs the one-hot matmuls with bf16 inputs (the
    one-hots are exact in bf16; the gathered factor values round to 8 mantissa
    bits — the same accuracy posture as the dense kernel's DEFAULT mode)."""
    _dot = _make_dot(precision)
    bd = zd_blk.shape[0]
    bw = wzT_blk.shape[0]
    oh_d = _onehot_2d(rows, bd)
    oh_w = _onehot_2d(cols, bw)
    x = _col_2d(x)[:, 0]
    zd_g = _dot(oh_d, zd_blk, (((1,), (0,)), ((), ())))          # (C, k)
    wz_g = _dot(oh_w, wzT_blk, (((1,), (0,)), ((), ())))         # (C, k)
    w_g = _dot(oh_d, w_blk, (((1,), (0,)), ((), ())))[:, 0]      # (C,)
    v = zd_g * wz_g
    s_plain = jnp.sum(v, axis=1)                                  # (C,)
    if thresh is not None:
        v_used = jnp.where(v > thresh, v, 0.0)
        s_used = jnp.sum(v_used, axis=1)
    else:
        v_used = None
        s_used = s_plain
    ratio = x / jnp.maximum(s_used, _TINY)
    return oh_d, oh_w, zd_g, wz_g, v_used, s_plain, ratio, w_g, x


def _sum_1d(x):
    """Scalar sum of a (C,) vector via a (1,C)@(C,1) dot — Mosaic's
    vector.multi_reduction on 1-D vectors hits INTERNAL compiler errors on
    v5e, the MXU reduction does not.  HIGHEST keeps the f32 values exact."""
    return jax.lax.dot_general(
        x.reshape(1, -1), jnp.ones((x.shape[0], 1), jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _accumulate_scalar(ll_ref, value, c):
    @pl.when(c == 0)
    def _():
        ll_ref[0, 0] = value

    @pl.when(c > 0)
    def _():
        ll_ref[0, 0] = ll_ref[0, 0] + value


def _make_word_pass_kernel(compute_ll, thresh, precision):
    """Chunks sorted word-block-major; emits the (m_pad, k) A accumulator and
    (optionally) the log-likelihood."""
    _dot = _make_dot(precision)

    def kernel(ci_ref, cj_ref, first_ref,
               rows_ref, cols_ref, vals_ref, zd_ref, wzT_ref, w_ref,
               a_ref, ll_ref):
        c = pl.program_id(0)
        oh_d, oh_w, zd_g, wz_g, v_used, s_plain, ratio, w_g, x = _entry_terms(
            rows_ref[:], cols_ref[:], vals_ref[:], zd_ref[:], wzT_ref[:],
            w_ref[:], thresh, precision
        )
        if thresh is not None:
            contrib = v_used * (ratio * w_g)[:, None]             # (C, k)
        else:
            contrib = zd_g * (ratio * w_g)[:, None]
        a_tile = _dot(oh_w, contrib, (((0,), (0,)), ((), ())))    # (Bw, k)

        @pl.when(first_ref[c] == 1)
        def _():
            a_ref[:] = jnp.zeros_like(a_ref)

        a_ref[:] = a_ref[:] + a_tile

        if compute_ll:
            term = x * jnp.log(jnp.maximum(s_plain, _TINY)) * w_g
            _accumulate_scalar(ll_ref, _sum_1d(term), c)
        else:
            _accumulate_scalar(ll_ref, jnp.float32(0.0), c)

    return kernel


def _make_doc_pass_kernel(compute_ll, thresh, precision):
    """Chunks sorted doc-block-major; emits the (n_pad, k) B accumulator."""
    _dot = _make_dot(precision)

    def kernel(ci_ref, cj_ref, first_ref,
               rows_ref, cols_ref, vals_ref, zd_ref, wzT_ref, w_ref,
               b_ref, ll_ref):
        c = pl.program_id(0)
        oh_d, oh_w, zd_g, wz_g, v_used, s_plain, ratio, w_g, x = _entry_terms(
            rows_ref[:], cols_ref[:], vals_ref[:], zd_ref[:], wzT_ref[:],
            w_ref[:], thresh, precision
        )
        if thresh is not None:
            contrib = v_used * ratio[:, None]
        else:
            contrib = wz_g * ratio[:, None]
        b_tile = _dot(oh_d, contrib, (((0,), (0,)), ((), ())))    # (Bd, k)

        @pl.when(first_ref[c] == 1)
        def _():
            b_ref[:] = jnp.zeros_like(b_ref)

        b_ref[:] = b_ref[:] + b_tile

        if compute_ll:
            term = x * jnp.log(jnp.maximum(s_plain, _TINY)) * w_g
            _accumulate_scalar(ll_ref, _sum_1d(term), c)
        else:
            _accumulate_scalar(ll_ref, jnp.float32(0.0), c)

    return kernel


def _pass_specs(bd, bw, kp, C):
    """Common in_specs for both passes (after the 3 scalar-prefetch args).
    Entry arrays are (n_chunks * C/128, 128); one grid step takes C/128 rows."""
    sub = C // 128
    return [
        pl.BlockSpec((sub, 128), lambda c, ci, cj, fj: (c, 0), memory_space=pltpu.VMEM),  # rows
        pl.BlockSpec((sub, 128), lambda c, ci, cj, fj: (c, 0), memory_space=pltpu.VMEM),  # cols
        pl.BlockSpec((sub, 128), lambda c, ci, cj, fj: (c, 0), memory_space=pltpu.VMEM),  # vals
        pl.BlockSpec((bd, kp), lambda c, ci, cj, fj: (ci[c], 0), memory_space=pltpu.VMEM),  # zd
        pl.BlockSpec((bw, kp), lambda c, ci, cj, fj: (cj[c], 0), memory_space=pltpu.VMEM),  # wzT
        pl.BlockSpec((bd, 1), lambda c, ci, cj, fj: (ci[c], 0), memory_space=pltpu.VMEM),   # w
    ]


@functools.partial(
    jax.jit,
    static_argnames=("bd", "bw", "compute_ll", "thresh_key", "n_pad", "m_pad",
                     "precision"),
)
def _word_pass(side, zd, wzT, w, bd, bw, compute_ll, thresh_key,
               n_pad, m_pad, precision="default"):
    kp = zd.shape[1]
    n_chunks = side["chunk_i"].shape[0]
    C = (side["rows"].shape[0] // n_chunks) * 128
    thr = float(thresh_key) if thresh_key is not None else None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=_pass_specs(bd, bw, kp, C),
        out_specs=[
            pl.BlockSpec((bw, kp), lambda c, ci, cj, fj: (cj[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c, ci, cj, fj: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    a_acc, ll = pl.pallas_call(
        _make_word_pass_kernel(compute_ll, thr, precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_interpret(),
    )(side["chunk_i"], side["chunk_j"], side["first"],
      side["rows"], side["cols"], side["vals"], zd, wzT, w)
    return a_acc, ll[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("bd", "bw", "compute_ll", "thresh_key", "n_pad", "m_pad",
                     "precision"),
)
def _doc_pass(side, zd, wzT, w, bd, bw, compute_ll, thresh_key,
              n_pad, m_pad, precision="default"):
    kp = zd.shape[1]
    n_chunks = side["chunk_i"].shape[0]
    C = (side["rows"].shape[0] // n_chunks) * 128
    thr = float(thresh_key) if thresh_key is not None else None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=_pass_specs(bd, bw, kp, C),
        out_specs=[
            pl.BlockSpec((bd, kp), lambda c, ci, cj, fj: (ci[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c, ci, cj, fj: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    b_acc, ll = pl.pallas_call(
        _make_doc_pass_kernel(compute_ll, thr, precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_interpret(),
    )(side["chunk_i"], side["chunk_j"], side["first"],
      side["rows"], side["cols"], side["vals"], zd, wzT, w)
    return b_acc, ll[0, 0]


# ---------------------------------------------------------------------------
# step functions (same contract as ops/sell.py)
# ---------------------------------------------------------------------------

def _padded_factors(zd, wz, n_pad, m_pad):
    n, k = zd.shape
    kp = round_up(k, 128)  # lane-dim for the (C, k) intermediates
    zd_p = jnp.zeros((n_pad, kp), jnp.float32).at[:n, :k].set(zd)
    wzT_p = jnp.zeros((m_pad, kp), jnp.float32).at[: wz.shape[1], :k].set(wz.T)
    return zd_p, wzT_p, kp


def em_step_chunks(dev, zd, wz, w=None, thresh=None, compute_ll=True,
                   bd=DEFAULT_BD, bw=DEFAULT_BW, n_pad=None, m_pad=None,
                   precision="default"):
    """One EM step on device chunk arrays; operates on UNPADDED (n,k)/(k,m)
    factors and returns the same."""
    n, k = zd.shape
    m = wz.shape[1]
    n_pad = n_pad or round_up(n, bd)
    m_pad = m_pad or round_up(m, bw)
    zd_p, wzT_p, kp = _padded_factors(zd, wz, n_pad, m_pad)
    w_col = (jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        w if w is not None else jnp.ones((n,), jnp.float32)))

    a_acc, ll = _word_pass(dev["word_major"], zd_p, wzT_p, w_col,
                           bd, bw, compute_ll, thresh, n_pad, m_pad,
                           precision=precision)
    b_acc, _ = _doc_pass(dev["doc_major"], zd_p, wzT_p, w_col,
                         bd, bw, False, thresh, n_pad, m_pad,
                         precision=precision)

    a_t = a_acc[:m, :k].T                                         # (k, m)
    b = b_acc[:n, :k]
    if thresh is None:
        num_wz = wz * a_t
        num_zd = zd * b
    else:
        num_wz = a_t
        num_zd = b
    next_wz = num_wz / jnp.maximum(num_wz.sum(axis=1, keepdims=True), _TINY)
    next_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)
    return next_zd, next_wz, ll


def refit_step_chunks(dev, zd, wz, w=None, thresh=None, compute_ll=True,
                      bd=DEFAULT_BD, bw=DEFAULT_BW, n_pad=None, m_pad=None,
                      precision="default"):
    """Frozen-topics step: the doc pass alone (reference plsa.py:733-816)."""
    n, k = zd.shape
    m = wz.shape[1]
    n_pad = n_pad or round_up(n, bd)
    m_pad = m_pad or round_up(m, bw)
    zd_p, wzT_p, kp = _padded_factors(zd, wz, n_pad, m_pad)
    w_col = (jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        w if w is not None else jnp.ones((n,), jnp.float32)))
    b_acc, ll = _doc_pass(dev["doc_major"], zd_p, wzT_p, w_col,
                          bd, bw, compute_ll, thresh, n_pad, m_pad,
                          precision=precision)
    b = b_acc[:n, :k]
    num_zd = (zd * b) if thresh is None else b
    next_zd = num_zd / jnp.maximum(num_zd.sum(axis=1, keepdims=True), _TINY)
    return next_zd, ll


def log_likelihood_chunks(dev, zd, wz, w=None,
                          bd=DEFAULT_BD, bw=DEFAULT_BW, n_pad=None, m_pad=None):
    """LL over nonzeros via the doc pass with the accumulator discarded."""
    n, k = zd.shape
    m = wz.shape[1]
    n_pad = n_pad or round_up(n, bd)
    m_pad = m_pad or round_up(m, bw)
    zd_p, wzT_p, kp = _padded_factors(zd, wz, n_pad, m_pad)
    w_col = (jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        w if w is not None else jnp.ones((n,), jnp.float32)))
    _, ll = _doc_pass(dev["doc_major"], zd_p, wzT_p, w_col,
                      bd, bw, True, None, n_pad, m_pad)
    return ll
