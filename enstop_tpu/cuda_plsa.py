"""Drop-in import path (reference module: enstop/cuda_plsa.py).

The reference gates ``GPUPLSA`` on CUDA availability; here the accelerated class
targets the TPU Pallas kernels (``TPUPLSA``), with ``GPUPLSA`` kept as an alias
so existing imports keep working.
"""

from .models.accelerated import GPUPLSA, TPUPLSA

__all__ = ["GPUPLSA", "TPUPLSA"]
