"""Drop-in import path (reference module: enstop/streamed_plsa.py)."""

from .models.streamed import StreamedPLSA
from .models.streamed_core import (
    streamed_fit_core as streamed_plsa_fit,
    streamed_refit_core as streamed_plsa_refit,
)

__all__ = ["StreamedPLSA", "streamed_plsa_fit", "streamed_plsa_refit"]
