"""Drop-in import path (reference module: enstop/streamed_plsa.py)."""

from .models.streamed import StreamedPLSA, streamed_plsa_fit, streamed_plsa_refit

__all__ = ["StreamedPLSA", "streamed_plsa_fit", "streamed_plsa_refit"]
