/* Native host-side corpus packer.
 *
 * The TPU data layout is zero-padded dense row blocks (see ops/data.py); turning
 * a CSR corpus into those blocks is the host-side hot path for initial staging
 * and for every out-of-core streamed iteration.  numpy's fancy-indexing scatter
 * (np.add.at) is single-threaded and type-dispatched; this is the same scatter
 * as a tight OpenMP loop over rows (rows are disjoint, so no synchronization).
 *
 * Also provides the bootstrap-resample densify used by the ensemble's
 * "resample" mode: out row r accumulates source row sample_ids[r].
 *
 * Built with: cc -O3 -march=native -fopenmp -shared -fPIC packer.c -o _packer.so
 * (see native/build.py; everything falls back to numpy when unavailable).
 */

#include <stdint.h>
#include <string.h>

#ifdef _OPENMP
#include <omp.h>
#endif

/* Densify CSR rows [row_start, row_end) into a zeroed (rows, out_cols) f32
 * buffer.  Duplicate column entries within a row accumulate. */
void densify_csr_rows(
    const int64_t *indptr,
    const int32_t *indices,
    const float *data,
    int64_t row_start,
    int64_t row_end,
    int64_t out_cols,
    float *out)
{
    int64_t nrows = row_end - row_start;
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t r = 0; r < nrows; ++r) {
        const int64_t lo = indptr[row_start + r];
        const int64_t hi = indptr[row_start + r + 1];
        float *row_out = out + r * out_cols;
        for (int64_t p = lo; p < hi; ++p) {
            row_out[indices[p]] += data[p];
        }
    }
}

/* Densify a bootstrap resample: out row r takes CSR row sample_ids[r]. */
void densify_csr_gather(
    const int64_t *indptr,
    const int32_t *indices,
    const float *data,
    const int64_t *sample_ids,
    int64_t n_samples,
    int64_t out_cols,
    float *out)
{
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t r = 0; r < n_samples; ++r) {
        const int64_t src = sample_ids[r];
        const int64_t lo = indptr[src];
        const int64_t hi = indptr[src + 1];
        float *row_out = out + r * out_cols;
        for (int64_t p = lo; p < hi; ++p) {
            row_out[indices[p]] += data[p];
        }
    }
}

/* Pack one CSR side into SELL segment arrays (see ops/sell.py): each row's
 * nonzeros split into lane-wide segments at segment rows
 * [seg_base[r], seg_base[r+1]).  Outputs are zeroed by the caller (padding
 * lanes/rows must stay zero).  Rows write disjoint segment ranges, so the
 * row loop parallelizes without synchronization; per-row writes are
 * sequential (the numpy equivalent is a 19M-element fancy-index scatter). */
void sell_pack_side(
    const int64_t *indptr,
    const int32_t *indices,
    const float *data,
    const int64_t *seg_base,
    int64_t n_rows,
    int64_t lane,
    int32_t *owner,
    int32_t *idx,
    float *val)
{
#pragma omp parallel for schedule(dynamic, 256)
    for (int64_t r = 0; r < n_rows; ++r) {
        const int64_t lo = indptr[r];
        const int64_t hi = indptr[r + 1];
        int64_t seg = seg_base[r];
        for (int64_t p = lo; p < hi; p += lane, ++seg) {
            const int64_t cnt = (hi - p < lane) ? (hi - p) : lane;
            owner[seg] = (int32_t)r;
            memcpy(idx + seg * lane, indices + p, (size_t)cnt * sizeof(int32_t));
            memcpy(val + seg * lane, data + p, (size_t)cnt * sizeof(float));
        }
    }
}

/* Pack the word-major SELL side straight from CSR — a counting-sort
 * transpose fused with segment packing, skipping the scipy tocsc()
 * materialization (the dominant cost of dual-side packing at scale).
 *
 * seg_base[c] is the first segment row of column c (exclusive cumsum of
 * per-column ceil(count/lane), computed by the caller from a bincount);
 * fill_pos is a zeroed int64 scratch of n_cols running per-column positions.
 * Scanning CSR row-by-row visits each column's entries in increasing row
 * order, so the output matches packing a sorted-indices CSC exactly.
 * Serial by construction (fill_pos is carried state); the scattered writes
 * land within one lane-row of each column's current segment, so locality is
 * the same as scipy's tocsc pass but with zero extra materialization. */
void sell_pack_word_side_from_csr(
    const int64_t *indptr,
    const int32_t *indices,
    const float *data,
    const int64_t *seg_base,
    int64_t n_rows,
    int64_t lane,
    int64_t *fill_pos,
    int32_t *owner,
    int32_t *idx,
    float *val)
{
    for (int64_t r = 0; r < n_rows; ++r) {
        const int64_t lo = indptr[r];
        const int64_t hi = indptr[r + 1];
        for (int64_t p = lo; p < hi; ++p) {
            const int32_t c = indices[p];
            const int64_t fp = fill_pos[c]++;
            const int64_t seg = seg_base[c] + fp / lane;
            const int64_t lp = fp % lane;
            owner[seg] = c;
            idx[seg * lane + lp] = (int32_t)r;
            val[seg * lane + lp] = data[p];
        }
    }
}

/* Stable counting sort: order_out receives the permutation that sorts `keys`
 * ascending (ties keep original order — matches np.lexsort's stability).
 * `pos` is a zeroed scratch of n_keys+1 int64.  Replaces the O(n log n)
 * lexsorts of the chunk packer with two O(n) passes over small tile keys. */
void counting_sort_by_key(
    const int64_t *keys,
    int64_t n,
    int64_t n_keys,
    int64_t *pos,
    int64_t *order_out)
{
    for (int64_t i = 0; i < n; ++i)
        pos[keys[i] + 1]++;
    for (int64_t k = 0; k < n_keys; ++k)
        pos[k + 1] += pos[k];
    for (int64_t i = 0; i < n; ++i)
        order_out[pos[keys[i]]++] = i;
}

/* Chunk-layout packing (ops/pallas_sell.py) in two O(nnz) passes, replacing
 * a numpy pipeline of ~15 nnz-sized temporaries.  Tile key of entry p is
 * major*n_minor + minor with (ti, tj) = (row/bd, col/bw); keys ascend in
 * (major, minor) order.  Pass 1 histograms keys; the (small, per-tile) chunk
 * bookkeeping happens in numpy; pass 2 streams the entries into their chunk
 * slots with tile-local ids, preserving original order within a tile (the
 * same order a stable sort by key yields). */
void chunk_histogram(
    const int32_t *rows,
    const int32_t *cols,
    int64_t nnz,
    int64_t bd,
    int64_t bw,
    int64_t n_ti,
    int64_t n_tj,
    int major_is_j,
    int64_t *counts)
{
    for (int64_t p = 0; p < nnz; ++p) {
        const int64_t ti = rows[p] / bd;
        const int64_t tj = cols[p] / bw;
        counts[major_is_j ? tj * n_ti + ti : ti * n_tj + tj]++;
    }
}

/* chunk_base[key] = final chunk row of the tile's first chunk (numpy computes
 * it including dummy-chunk offsets); fill_pos is a zeroed int64[n_keys].
 * Output arrays are zeroed (n_chunks * chunkC). */
void chunk_fill(
    const int32_t *rows,
    const int32_t *cols,
    const float *vals,
    int64_t nnz,
    int64_t bd,
    int64_t bw,
    int64_t n_ti,
    int64_t n_tj,
    int major_is_j,
    int64_t chunkC,
    const int64_t *chunk_base,
    int64_t *fill_pos,
    int32_t *rows_local,
    int32_t *cols_local,
    float *vals_out)
{
    for (int64_t p = 0; p < nnz; ++p) {
        const int64_t ti = rows[p] / bd;
        const int64_t tj = cols[p] / bw;
        const int64_t key = major_is_j ? tj * n_ti + ti : ti * n_tj + tj;
        const int64_t w = fill_pos[key]++;
        const int64_t dst = (chunk_base[key] + w / chunkC) * chunkC + w % chunkC;
        rows_local[dst] = (int32_t)(rows[p] - ti * bd);
        cols_local[dst] = (int32_t)(cols[p] - tj * bw);
        vals_out[dst] = vals[p];
    }
}

int packer_num_threads(void)
{
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

/* f32 -> bf16 with round-to-nearest-even (counts <= 256 are exact). */
static inline uint16_t f32_to_bf16(float f)
{
    uint32_t x;
    memcpy(&x, &f, 4);
    uint32_t bias = 0x7fffu + ((x >> 16) & 1u);
    return (uint16_t)((x + bias) >> 16);
}

/* Densify CSR rows straight into a zeroed (rows, out_cols) bf16 buffer,
 * halving the host staging traffic and the H2D transfer vs densify-f32 +
 * astype.  Duplicate columns accumulate exactly (f32 scratch per thread:
 * scratch has shape (n_threads, out_cols), zeroed once by the caller; rows
 * re-zero only the entries they touched). */
void densify_csr_rows_bf16(
    const int64_t *indptr,
    const int32_t *indices,
    const float *data,
    int64_t row_start,
    int64_t row_end,
    int64_t out_cols,
    uint16_t *out,
    float *scratch)
{
    int64_t nrows = row_end - row_start;
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t r = 0; r < nrows; ++r) {
#ifdef _OPENMP
        float *s = scratch + (int64_t)omp_get_thread_num() * out_cols;
#else
        float *s = scratch;
#endif
        const int64_t lo = indptr[row_start + r];
        const int64_t hi = indptr[row_start + r + 1];
        uint16_t *row_out = out + r * out_cols;
        for (int64_t p = lo; p < hi; ++p)
            s[indices[p]] += data[p];
        for (int64_t p = lo; p < hi; ++p) {
            const int32_t c = indices[p];
            if (s[c] != 0.0f) {
                row_out[c] = f32_to_bf16(s[c]);
                s[c] = 0.0f;
            }
        }
    }
}
