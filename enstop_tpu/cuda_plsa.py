"""Drop-in import path (reference module: enstop/cuda_plsa.py).

The reference gates ``GPUPLSA`` on CUDA availability; here the accelerated class
targets the TPU Pallas kernels (``TPUPLSA``), with ``GPUPLSA`` kept as an alias
so existing imports keep working.
"""

from .models.accelerated import GPUPLSA, TPUPLSA


def plsa_fit(
    data,
    k,
    n_row_blocks=8,
    n_col_blocks=8,
    init="random",
    n_iter=100,
    n_iter_per_test=10,
    tolerance=0.001,
    e_step_thresh=1e-32,
    random_state=None,
):
    """Functional accelerator fit, reference signature (cuda_plsa.py:157-353):
    returns ``(P(z|d), P(w|z))``.  The CUDA tile grid maps to the fused Pallas
    kernel's internal tiling; ``n_row_blocks``/``n_col_blocks`` are accepted
    for signature parity (the kernel picks its own measured-best tiles)."""
    del n_row_blocks, n_col_blocks
    from .ops.driver import plsa_fit as _fit

    return _fit(
        data, k, init=init, n_iter=n_iter, n_iter_per_test=n_iter_per_test,
        tolerance=tolerance, e_step_thresh=e_step_thresh,
        random_state=random_state,
    )


__all__ = ["GPUPLSA", "TPUPLSA", "plsa_fit"]
