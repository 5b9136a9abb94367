"""Drop-in import path for reference users: ``from enstop.plsa import ...`` maps
to ``from enstop_tpu.plsa import ...`` (reference module: enstop/plsa.py).

The reference's module-public numba kernels (``plsa_e_step``, ``plsa_m_step``,
``log_likelihood``, the ``*_inner`` loop drivers — plsa.py:25-386, 516-640)
are execution details of its CPU model (a materialized (nnz, k)
responsibilities array) and intentionally have no same-signature counterparts;
their exact semantics live in ``enstop_tpu.ops.coo`` (thresholded E/M/LL over
COO arrays) and the fused production forms in ``enstop_tpu.ops.em`` /
``ops.pallas_em`` / ``ops.fit``."""

from .models.plsa import PLSA
from .ops.driver import plsa_fit, plsa_refit
from .ops.init import plsa_init

__all__ = ["PLSA", "plsa_fit", "plsa_refit", "plsa_init"]
