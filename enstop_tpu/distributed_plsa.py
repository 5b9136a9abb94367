"""Drop-in import path (reference module: enstop/distributed_plsa.py)."""

from .models.mesh import DistributedPLSA

__all__ = ["DistributedPLSA"]
