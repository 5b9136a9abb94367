"""Drop-in import path for reference users: ``from enstop.plsa import ...`` maps
to ``from enstop_tpu.plsa import ...`` (reference module: enstop/plsa.py)."""

from .models.plsa import PLSA
from .ops.driver import plsa_fit, plsa_refit
from .ops.init import plsa_init

__all__ = ["PLSA", "plsa_fit", "plsa_refit", "plsa_init"]
