"""Reference import-path parity: every driver-level symbol a reference user
can import keeps working at the same path (internal numba kernels excepted —
see enstop_tpu/plsa.py docstring for the documented boundary)."""

import numpy as np
import scipy.sparse as sp


def _corpus():
    return sp.csr_matrix(
        np.random.RandomState(0).poisson(0.8, (50, 70)).astype(np.int64)
    )


def test_module_level_driver_symbols():
    from enstop_tpu.plsa import PLSA, plsa_fit, plsa_refit, plsa_init
    from enstop_tpu.streamed_plsa import (
        StreamedPLSA, plsa_fit as s_fit, plsa_refit as s_refit,
    )
    from enstop_tpu.block_parallel_plsa import BlockParallelPLSA, plsa_fit as b_fit
    from enstop_tpu.distributed_plsa import DistributedPLSA, plsa_fit as d_fit
    from enstop_tpu.cuda_plsa import GPUPLSA, plsa_fit as c_fit
    from enstop_tpu.enstop_ import EnsembleTopics, ensemble_fit, ensemble_of_topics
    from enstop_tpu.utils import (
        normalize, standardize_input, arr_intersect,
        coherence, mean_coherence, log_lift, mean_log_lift,
    )


def test_functional_variant_fits_return_factors():
    """Each variant's module-level plsa_fit returns (P(z|d), P(w|z)) like the
    reference's, at its reference signature."""
    from enstop_tpu import streamed_plsa, block_parallel_plsa, distributed_plsa
    from enstop_tpu import cuda_plsa

    X = _corpus()
    for fit, kw in (
        (streamed_plsa.plsa_fit, dict(block_size=16)),
        (block_parallel_plsa.plsa_fit, dict(n_row_blocks=2, n_col_blocks=2)),
        (distributed_plsa.plsa_fit, {}),
        (cuda_plsa.plsa_fit, {}),
    ):
        zd, wz = fit(X, 3, n_iter=6, random_state=0, **kw)
        assert zd.shape == (50, 3) and wz.shape == (3, 70)
        np.testing.assert_allclose(np.asarray(wz).sum(1), 1.0, rtol=1e-4)
    emb = streamed_plsa.plsa_refit(X, np.asarray(wz), n_iter=4, random_state=0)
    assert emb.shape == (50, 3)
