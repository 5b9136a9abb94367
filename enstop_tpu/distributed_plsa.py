"""Drop-in import path (reference module: enstop/distributed_plsa.py)."""

from .models.mesh import DistributedPLSA


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
    """Functional distributed fit, reference signature
    (distributed_plsa.py:286-371): returns ``(P(z|d), P(w|z))``; the block
    grid maps to the device mesh and dask's per-iteration gather barrier is
    replaced by on-device collectives."""
    del e_step_thresh  # numerically inert at the reference default
    model = DistributedPLSA(
        n_components=k, init=init, n_row_blocks=n_row_blocks,
        n_col_blocks=n_col_blocks, n_iter=n_iter,
        n_iter_per_test=n_iter_per_test, tolerance=tolerance,
        random_state=random_state,
    )
    embedding = model.fit_transform(X)
    return embedding, model.components_


__all__ = ["DistributedPLSA", "plsa_fit"]
