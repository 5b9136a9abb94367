"""Drop-in import path (reference module: enstop/block_parallel_plsa.py).

The reference's in-process 2D tile grid is subsumed by the mesh-sharded backend
(enstop_tpu/parallel/mesh.py); a mesh of one device reproduces it exactly.
"""

from .models.mesh import BlockParallelPLSA

__all__ = ["BlockParallelPLSA"]
