"""Accelerator-resident pLSA: ``TPUPLSA`` (and ``GPUPLSA`` drop-in alias).

The reference's ``GPUPLSA`` (cuda_plsa.py:356-470) exists because its CPU variants
cannot target an accelerator; it stages tiles to the device, runs numba-CUDA
kernels, and downloads the factors for every host-side convergence test
(cuda_plsa.py:271-315).  In this framework *every* variant already runs on the
accelerator with the convergence loop compiled on-device, so the accelerated class
is the flat :class:`~enstop_tpu.models.plsa.PLSA` pinned to the fused Pallas
backend — provided so reference users can switch their ``GPUPLSA`` imports 1:1.
"""

from __future__ import annotations

import jax

from .plsa import PLSA


class TPUPLSA(PLSA):
    """pLSA pinned to the fused device kernel path (errors early off-accelerator)."""

    def __init__(
        self,
        n_components=10,
        init="random",
        n_row_blocks=8,
        n_col_blocks=8,
        n_iter=100,
        n_iter_per_test=10,
        tolerance=0.001,
        e_step_thresh=1e-32,
        transform_random_seed=42,
        random_state=None,
        backend="pallas",
        precision="default",
    ):
        # parameter ORDER matches the reference exactly (cuda_plsa.py:357-368)
        # so positional construction like GPUPLSA(10, "random", 4, 4) binds
        # the tile grid, not n_iter.
        super().__init__(
            n_components=n_components,
            init=init,
            n_iter=n_iter,
            n_iter_per_test=n_iter_per_test,
            tolerance=tolerance,
            e_step_thresh=e_step_thresh,
            transform_random_seed=transform_random_seed,
            random_state=random_state,
            backend=backend,
            precision=precision,
        )
        # Reference-signature compatibility (cuda_plsa.py:357-368): the CUDA
        # variant asks the USER for its tile-grid shape; here the Pallas
        # kernel picks hardware-aligned tile sizes itself (ops/pallas_em.py:
        # pick_block_shape), so these are accepted — sklearn get_params/
        # set_params round-trip them — but do not alter execution.
        self.n_row_blocks = n_row_blocks
        self.n_col_blocks = n_col_blocks

    def fit_transform(self, X, y=None, sample_weight=None):
        if self.backend == "pallas" and jax.default_backend() not in ("tpu",):
            # interpret-mode Pallas works anywhere but is slow; match the
            # reference's behavior of requiring the accelerator (cuda_plsa.py
            # imports fail without CUDA) while staying usable in tests.
            import warnings

            warnings.warn(
                "TPUPLSA: no TPU backend detected; running the Pallas kernels "
                "in interpreter mode (slow). Use PLSA(backend='xla') on CPU."
            )
        return super().fit_transform(X, y=y, sample_weight=sample_weight)


GPUPLSA = TPUPLSA
