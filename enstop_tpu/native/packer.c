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

int packer_num_threads(void)
{
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}
