"""Batched multi-run fused EM kernel: the ensemble's bootstrap fits in one pass.

The ensemble fits R bootstrap runs against the SAME corpus (bootstraps are
multinomial document weights — models/ensemble.py).  Running them sequentially
re-streams X from HBM once per run per iteration; this kernel amortizes that:

    grid = (i, j, r)   — r innermost, so each X tile loads to VMEM once per
                          (i, j) and serves ALL R runs' matmuls while resident

Per (i, j, r) step, with run-r factor tiles:

    S = zd[r] @ wz[r];  Rm = w[r] masked X / S
    A[r] (+)= (w_boot[r] ⊙ zd[r])^T @ Rm        (aliased HBM accumulator)
    B[r] (+)= Rm @ wz[r]^T                      (VMEM-resident (R, Bd, kp) slab,
                                                 flushed once per row-block i)

Traffic per ensemble iteration ≈ X once + A read-modify-write + wz re-reads —
measured-model ~4x less than R sequential passes (compute does not amortize:
the MXU work is inherently R-fold).  Normalization of all runs' factors happens
outside on (R, k, m)/(R, n, k) arrays.

Runs use a fixed iteration count (no per-run early stop): the reference's
bootstrap fits converge at similar depths, and the amortized pass is ~2x
faster than sequential even while running every run to n_iter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_em import _resolve_precision

_TINY = 1e-30

_BATCH_BD = 1024
_BATCH_BW = 1024


def pick_batch_block_shape(n, m, bd=None, bw=None):
    bd = bd or min(_BATCH_BD, -(-max(n, 1) // 16) * 16)
    bw = bw or min(_BATCH_BW, -(-max(m, 1) // 128) * 128)
    return bd, bw


def _interpret():
    return jax.default_backend() != "tpu"


def _make_batch_kernel(precision):
    def kernel(x_ref, zd_ref, wz_ref, w_ref, a_in_ref, a_out_ref, b_ref):
        j = pl.program_id(1)
        r = pl.program_id(2)

        x = x_ref[:].astype(jnp.float32)           # (Bd, Bw)
        zd = zd_ref[0]                              # (Bd, kp)
        wz = wz_ref[0]                              # (kp, Bw)
        w = w_ref[0]                                # (Bd, 1)

        s = jax.lax.dot_general(
            zd, wz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        rm = jnp.where(x > 0, x / jnp.maximum(s, _TINY), 0.0)

        a_tile = jax.lax.dot_general(
            zd * w, rm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        b_tile = jax.lax.dot_general(
            rm, wz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

        # A[r, :, j]: aliased HBM accumulator (revisited across i, non-consecutive)
        a_out_ref[0] = a_in_ref[0] + a_tile

        # B slab (R, Bd, kp): resident for the whole (j, r) sweep of row-block i
        @pl.when(jnp.logical_and(j == 0, r == 0))
        def _():
            b_ref[:] = jnp.zeros_like(b_ref)

        b_ref[r] += b_tile

    return kernel


@functools.partial(jax.jit, static_argnames=("bd", "bw", "precision_key"))
def _batched_accumulators(X, zds, wzs, ws, bd, bw, precision_key="default"):
    """(A, B) accumulators for all runs in one pass.

    X: (n, m); zds: (R, n, kp); wzs: (R, kp, m); ws: (R, n, 1).
    Returns A: (R, kp, m), B: (R, n, kp).
    """
    n, m = X.shape
    R, _, kp = zds.shape
    grid = (n // bd, m // bw, R)
    precision = _resolve_precision(precision_key)
    if _interpret() and n > bd:
        # Pallas interpret mode mishandles input_output_aliases on blocks
        # revisited non-consecutively (see ops/pallas_em.py, which routes its
        # interpret path through an alias-free layout).  This batch kernel is
        # a measured-and-rejected alternative kept only for device A/B tests,
        # so off-TPU it refuses multi-row-block grids instead of silently
        # corrupting the aliased A accumulator.
        raise NotImplementedError(
            "pallas_batch interpret mode supports single-row-block grids "
            f"only (n={n} > bd={bd}); run on TPU or raise bd"
        )
    a_zero = jnp.zeros((R, kp, m), jnp.float32)

    a_acc, b_acc = pl.pallas_call(
        _make_batch_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bd, bw), lambda i, j, r: (i, j), memory_space=pltpu.VMEM),      # X
            pl.BlockSpec((1, bd, kp), lambda i, j, r: (r, i, 0), memory_space=pltpu.VMEM),  # zd
            pl.BlockSpec((1, kp, bw), lambda i, j, r: (r, 0, j), memory_space=pltpu.VMEM),  # wz
            pl.BlockSpec((1, bd, 1), lambda i, j, r: (r, i, 0), memory_space=pltpu.VMEM),   # w
            pl.BlockSpec((1, kp, bw), lambda i, j, r: (r, 0, j), memory_space=pltpu.VMEM),  # A in
        ],
        out_specs=[
            pl.BlockSpec((1, kp, bw), lambda i, j, r: (r, 0, j), memory_space=pltpu.VMEM),  # A out
            pl.BlockSpec((R, bd, kp), lambda i, j, r: (0, i, 0), memory_space=pltpu.VMEM),  # B slab
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, kp, m), jnp.float32),
            jax.ShapeDtypeStruct((R, n, kp), jnp.float32),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n * m * kp * R,
            bytes_accessed=n * m * X.dtype.itemsize + 2 * R * (kp * m + n * kp) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(X, zds, wzs, ws, a_zero)
    return a_acc, b_acc


def batched_em_step(X, zds, wzs, ws=None, bd=None, bw=None, precision="default"):
    """One EM step for R runs sharing X. Shapes as in :func:`_batched_accumulators`;
    ``ws`` is (R, n) per-run document weights (bootstrap multiplicities)."""
    n, m = X.shape
    R = zds.shape[0]
    bd, bw = pick_batch_block_shape(n, m, bd, bw)
    if ws is None:
        wcol = jnp.ones((R, n, 1), jnp.float32)
    else:
        wcol = ws.reshape(R, n, 1).astype(jnp.float32)

    A, B = _batched_accumulators(X, zds, wzs, wcol, bd, bw, precision_key=precision)
    next_wz = wzs * A
    next_wz = next_wz / jnp.maximum(next_wz.sum(axis=2, keepdims=True), _TINY)
    next_zd = zds * B
    next_zd = next_zd / jnp.maximum(next_zd.sum(axis=2, keepdims=True), _TINY)
    return next_zd, next_wz


@functools.partial(jax.jit, static_argnames=("n_iter", "bd", "bw", "precision"))
def batched_em_fit(X, zds, wzs, ws, n_iter, bd=None, bw=None, precision="default"):
    """Fixed-iteration batched fit of all runs (one compiled loop program)."""

    def body(_, state):
        zds, wzs = state
        return batched_em_step(X, zds, wzs, ws, bd=bd, bw=bw, precision=precision)

    return jax.lax.fori_loop(0, n_iter, body, (zds, wzs))
