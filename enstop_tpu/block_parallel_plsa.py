"""Drop-in import path (reference module: enstop/block_parallel_plsa.py).

The reference's in-process 2D tile grid is subsumed by the mesh-sharded backend
(enstop_tpu/parallel/mesh.py); a mesh of one device reproduces it exactly.
"""

from .models.mesh import BlockParallelPLSA


def plsa_fit(
    X,
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
    """Functional blocked fit, reference signature
    (block_parallel_plsa.py:339-421): returns ``(P(z|d), P(w|z))``.  The
    ``n_row_blocks x n_col_blocks`` grid maps to the device mesh (clamped to
    available devices; the math is block-count invariant)."""
    del e_step_thresh  # numerically inert at the reference default; see ARCHITECTURE.md
    model = BlockParallelPLSA(
        n_components=k, init=init, n_row_blocks=n_row_blocks,
        n_col_blocks=n_col_blocks, n_iter=n_iter,
        n_iter_per_test=n_iter_per_test, tolerance=tolerance,
        random_state=random_state,
    )
    embedding = model.fit_transform(X)
    return embedding, model.components_


__all__ = ["BlockParallelPLSA", "plsa_fit"]
