"""Native host-side runtime components (C + OpenMP), ctypes-bound.

Compiled lazily with the system compiler on first use and cached next to the
source; every entry point has a numpy fallback, so the package works without a
toolchain.  See packer.c for what lives here and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_packer.so")
_SRC_PATH = os.path.join(_HERE, "packer.c")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    for cc in ("cc", "gcc", "clang"):
        for extra in (["-fopenmp"], []):
            try:
                subprocess.run(
                    [cc, "-O3", "-march=native", "-shared", "-fPIC", *extra,
                     _SRC_PATH, "-o", _SO_PATH],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                return True
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired):
                continue
    return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        lib.densify_csr_rows.argtypes = [
            i64p, i32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f32p,
        ]
        lib.densify_csr_rows.restype = None
        lib.densify_csr_gather.argtypes = [
            i64p, i32p, f32p, i64p,
            ctypes.c_int64, ctypes.c_int64, f32p,
        ]
        lib.densify_csr_gather.restype = None
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C")
        lib.densify_csr_rows_bf16.argtypes = [
            i64p, i32p, f32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u16p, f32p,
        ]
        lib.densify_csr_rows_bf16.restype = None
        lib.sell_pack_side.argtypes = [
            i64p, i32p, f32p, i64p,
            ctypes.c_int64, ctypes.c_int64, i32p, i32p, f32p,
        ]
        lib.sell_pack_side.restype = None
        lib.sell_pack_word_side_from_csr.argtypes = [
            i64p, i32p, f32p, i64p,
            ctypes.c_int64, ctypes.c_int64, i64p, i32p, i32p, f32p,
        ]
        lib.sell_pack_word_side_from_csr.restype = None
        lib.counting_sort_by_key.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
        ]
        lib.counting_sort_by_key.restype = None
        lib.chunk_histogram.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, i64p,
        ]
        lib.chunk_histogram.restype = None
        lib.chunk_fill.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            i64p, i64p, i32p, i32p, f32p,
        ]
        lib.chunk_fill.restype = None
        lib.packer_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def _csr_arrays(X):
    indptr = np.ascontiguousarray(X.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(X.indices, dtype=np.int32)
    data = np.ascontiguousarray(X.data, dtype=np.float32)
    return indptr, indices, data


def densify_csr_rows(X, row_start, row_end, out):
    """Scatter CSR rows [row_start, row_end) into the zeroed f32 buffer ``out``
    of shape (row_end - row_start <= out.shape[0], out_cols >= X.shape[1])."""
    lib = get_lib()
    if lib is None:
        sub = X[row_start:row_end]
        coo = sub.tocoo()
        np.add.at(out, (coo.row, coo.col), coo.data.astype(np.float32))
        return out
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.float32
    indptr, indices, data = _csr_arrays(X)
    lib.densify_csr_rows(
        indptr, indices, data, row_start, row_end, out.shape[1], out
    )
    return out


def densify_csr_rows_bf16(X, row_start, row_end, out):
    """Scatter CSR rows straight into a zeroed bf16 buffer (ml_dtypes.bfloat16
    viewed as uint16), halving staging traffic vs densify-f32 + astype."""
    import ml_dtypes

    lib = get_lib()
    if lib is None:
        sub = X[row_start:row_end]
        coo = sub.tocoo()
        tmp = np.zeros(out.shape, np.float32)
        np.add.at(tmp, (coo.row, coo.col), coo.data.astype(np.float32))
        out[...] = tmp.astype(ml_dtypes.bfloat16).view(np.uint16)
        return out
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.uint16
    indptr, indices, data = _csr_arrays(X)
    n_threads = max(int(lib.packer_num_threads()), 1)
    scratch = np.zeros((n_threads, out.shape[1]), np.float32)
    lib.densify_csr_rows_bf16(
        indptr, indices, data, row_start, row_end, out.shape[1], out, scratch
    )
    return out


def sell_pack_side(indptr, indices, data, seg_base, lane, owner, idx, val):
    """Pack one CSR side into zeroed SELL segment arrays (ops/sell.py layout).

    ``seg_base[r]`` is the first segment row of CSR row ``r`` (exclusive
    cumsum of per-row segment counts).  Returns True when the native path
    ran; False means the caller must use its numpy fallback."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "sell_pack_side"):
        return False
    n_rows = seg_base.shape[0]
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    seg_base = np.ascontiguousarray(seg_base, dtype=np.int64)
    assert owner.flags["C_CONTIGUOUS"] and idx.flags["C_CONTIGUOUS"] and val.flags["C_CONTIGUOUS"]
    lib.sell_pack_side(
        indptr, indices, data, seg_base, n_rows, lane,
        owner, idx.reshape(-1), val.reshape(-1),
    )
    return True


def sell_pack_word_side_from_csr(indptr, indices, data, seg_base, lane,
                                 owner, idx, val):
    """Counting-sort transpose of a CSR matrix straight into zeroed word-major
    SELL arrays, fused with segment packing (skips scipy ``tocsc``).

    ``seg_base[c]`` = first segment row of column c.  Returns True when the
    native path ran; False means the caller must transpose + pack itself."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "sell_pack_word_side_from_csr"):
        return False
    n_rows = indptr.shape[0] - 1
    n_cols = seg_base.shape[0]
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    seg_base = np.ascontiguousarray(seg_base, dtype=np.int64)
    fill_pos = np.zeros(n_cols, np.int64)
    assert owner.flags["C_CONTIGUOUS"] and idx.flags["C_CONTIGUOUS"] and val.flags["C_CONTIGUOUS"]
    lib.sell_pack_word_side_from_csr(
        indptr, indices, data, seg_base, n_rows, lane, fill_pos,
        owner, idx.reshape(-1), val.reshape(-1),
    )
    return True


def counting_sort_by_key(keys, n_keys):
    """Stable ascending-sort permutation of small-integer ``keys`` (two O(n)
    native passes).  Returns the order array, or None if the native library
    is unavailable (caller falls back to np.lexsort/argsort)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "counting_sort_by_key"):
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    pos = np.zeros(int(n_keys) + 1, np.int64)
    order = np.empty(keys.shape[0], np.int64)
    lib.counting_sort_by_key(keys, keys.shape[0], int(n_keys), pos, order)
    return order


def chunk_histogram(rows, cols, bd, bw, n_ti, n_tj, major_is_j):
    """Per-tile-key entry counts for the chunk packer (one native pass).
    Returns the int64 counts array, or None if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "chunk_histogram"):
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    counts = np.zeros(int(n_ti) * int(n_tj), np.int64)
    lib.chunk_histogram(rows, cols, rows.shape[0], bd, bw, n_ti, n_tj,
                        int(bool(major_is_j)), counts)
    return counts


def chunk_fill(rows, cols, vals, bd, bw, n_ti, n_tj, major_is_j, chunkC,
               chunk_base, rows_local, cols_local, vals_out):
    """Stream entries into their chunk slots with tile-local ids (one native
    pass; outputs zeroed by caller).  Returns False if unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "chunk_fill"):
        return False
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    chunk_base = np.ascontiguousarray(chunk_base, dtype=np.int64)
    fill_pos = np.zeros(int(n_ti) * int(n_tj), np.int64)
    lib.chunk_fill(rows, cols, vals, rows.shape[0], bd, bw, n_ti, n_tj,
                   int(bool(major_is_j)), chunkC, chunk_base, fill_pos,
                   rows_local.reshape(-1), cols_local.reshape(-1),
                   vals_out.reshape(-1))
    return True


def densify_csr_gather(X, sample_ids, out):
    """Bootstrap densify: ``out[r] = X[sample_ids[r]]`` (f32, zeroed ``out``)."""
    lib = get_lib()
    if lib is None:
        sub = X[np.asarray(sample_ids)]
        coo = sub.tocoo()
        np.add.at(out, (coo.row, coo.col), coo.data.astype(np.float32))
        return out
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.float32
    indptr, indices, data = _csr_arrays(X)
    ids = np.ascontiguousarray(sample_ids, dtype=np.int64)
    lib.densify_csr_gather(
        indptr, indices, data, ids, ids.shape[0], out.shape[1], out
    )
    return out
