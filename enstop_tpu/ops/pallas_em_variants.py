"""Experimental grid layouts for the fused EM kernel (round-3 headroom work).

HBM-traffic analysis of the shipped kernel (ops/pallas_em.py) per EM
iteration at 20NG shape (n_pad=18944, m_pad=25600, bd=512, bw=1024, X bf16),
with kp = round_up(k, 8):

    grid (i, j), i outer (j minor):
      X stream                         n*m*2            = 0.97 GB
      A aliased RMW per (i,j) visit    2*grid_i*kp*m*4  = 0.30 GB * (kp/32)
      wz re-read per (i,j) visit       grid_i*kp*m*4    = 0.15 GB * (kp/32)
      zd / B (strip-resident)                           ~ kp-proportional, small

At k=20 (kp=24) the accumulator traffic is a minor term -- consistent with
round-2's measurement that the step is MXU/VPU-bound there (int8-X halving
of the X stream changed nothing; docs/PERFORMANCE.md).  At the BASELINE
envelope's k=100/200 configs, A-RMW + wz re-reads scale with kp and reach
~2.3 GB/iter at kp=200 -- comparable to the whole X stream -- while the
measured step time (3.5x the k=20 step) sits well above both the MXU floor
(6*n*m*kp_mxu bf16 flops) and the HBM floor, so there is headroom and the
accumulator traffic is the most addressable share of it.

Swapping the sweep order makes the (kp, bw) A tile and the wz tile functions
of the OUTER index -- both become strip-resident -- and moves the RMW to the
(bd, kp) B tile:

    variant "jo"          -- grid (j, i), j outer, B aliased RMW
    variant "jo_resident" -- grid (j, i), whole B resident in VMEM
                            (n*kp*4 bytes on top of the tile buffers; no
                            HBM RMW traffic for either accumulator, and the
                            only alias-free layout -- also the interpret-mode
                            execution path, see pallas_em)

A and B accumulate in the SAME per-tile order as the shipped kernel (i-order
for A, j-order for B), so factors are expected bit-identical; only the
scalar ll reduction order changes (tolerance-level).

Measured on TPU by scripts/exp_kernel_v3.py, which sweeps k in {20, 100,
200} (queued for a live relay -- scripts/tpu_round3_queue.sh); promote a
winner into pallas_em.py only with numbers in hand.  CPU parity:
tests/test_kernel_variants.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_em import (
    _TINY,
    _VMEM_BUDGET,
    _cost,
    _dot,
    _interpret,
    _resolve_precision,
    _weights_col,
    pick_block_shape,
)

__all__ = ["em_accumulators_variant", "refit_accumulator_variant", "VARIANTS"]

VARIANTS = ("jo", "jo_resident", "jo_res_bf16r")


def _accumulate_scalar_first(ll_ref, value, is_first):
    @pl.when(is_first)
    def _():
        ll_ref[0, 0] = value

    @pl.when(jnp.logical_not(is_first))
    def _():
        ll_ref[0, 0] = ll_ref[0, 0] + value


def _tile_math(x_ref, zd_ref, wz_ref, w_ref, precision, bf16_r=False):
    """Per-tile E+M math.  With ``bf16_r`` the responsibilities ratio is
    computed and fed to the MXU in bf16: under DEFAULT matmul precision the
    MXU sees bf16 inputs either way, and a correctly-rounded bf16 division
    equals the bf16 rounding of the f32 quotient up to rare double-rounding
    ties — but the f32 cast-up of X, the f32 divide, and the cast-down
    before the MXU all disappear from the VPU stream.  Only meaningful for
    the hot ``compute_ll=False`` step; the LL term stays f32."""
    x = x_ref[:].astype(jnp.float32)
    zd = zd_ref[:]
    wz = wz_ref[:]
    w = w_ref[:]
    s = _dot(zd, wz, ((1,), (0,)), precision)
    s_safe = jnp.maximum(s, _TINY)
    if bf16_r:
        r = x_ref[:].astype(jnp.bfloat16) / s_safe.astype(jnp.bfloat16)
        a_tile = _dot((zd * w).astype(jnp.bfloat16), r, ((0,), (0,)), precision)
        b_tile = _dot(r, wz.astype(jnp.bfloat16), ((1,), (1,)), precision)
    else:
        r = x / s_safe  # mask-free; see ops/pallas_em.py
        a_tile = _dot(zd * w, r, ((0,), (0,)), precision)  # (kp, Bw)
        b_tile = _dot(r, wz, ((1,), (1,)), precision)      # (Bd, kp)
    return x, s_safe, w, a_tile, b_tile


def _make_em_kernel_jo(compute_ll, precision):
    """Grid (j, i), j outer: A and wz strip-resident, B aliased RMW."""

    def kernel(x_ref, zd_ref, wz_ref, w_ref, b_in_ref, a_ref, b_out_ref, ll_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x, s_safe, w, a_tile, b_tile = _tile_math(
            x_ref, zd_ref, wz_ref, w_ref, precision
        )

        # A: resident across the i-sweep of this column strip.
        @pl.when(i == 0)
        def _():
            a_ref[:] = a_tile

        @pl.when(i > 0)
        def _():
            a_ref[:] = a_ref[:] + a_tile

        # B: aliased HBM accumulator (the revisit axis is now j).
        b_out_ref[:] = b_in_ref[:] + b_tile

        if compute_ll:
            ll_tile = jnp.sum(x * jnp.log(s_safe) * w)
            _accumulate_scalar_first(
                ll_ref, ll_tile, jnp.logical_and(i == 0, j == 0)
            )
        else:
            _accumulate_scalar_first(
                ll_ref, jnp.float32(0.0), jnp.logical_and(i == 0, j == 0)
            )

    return kernel


def _make_em_kernel_jo_resident(compute_ll, precision, bd, bf16_r=False):
    """Grid (j, i), whole B held in the VMEM output block (constant index
    map), sliced per row block — no HBM RMW traffic for either accumulator."""

    def kernel(x_ref, zd_ref, wz_ref, w_ref, a_ref, b_ref, ll_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x, s_safe, w, a_tile, b_tile = _tile_math(
            x_ref, zd_ref, wz_ref, w_ref, precision, bf16_r=bf16_r
        )

        @pl.when(i == 0)
        def _():
            a_ref[:] = a_tile

        @pl.when(i > 0)
        def _():
            a_ref[:] = a_ref[:] + a_tile

        rows = pl.ds(i * bd, bd)

        @pl.when(j == 0)
        def _():
            b_ref[rows, :] = b_tile

        @pl.when(j > 0)
        def _():
            b_ref[rows, :] = b_ref[rows, :] + b_tile

        if compute_ll:
            ll_tile = jnp.sum(x * jnp.log(s_safe) * w)
            _accumulate_scalar_first(
                ll_ref, ll_tile, jnp.logical_and(i == 0, j == 0)
            )
        else:
            _accumulate_scalar_first(
                ll_ref, jnp.float32(0.0), jnp.logical_and(i == 0, j == 0)
            )

    return kernel


def _make_refit_kernel_jo_resident(compute_ll, precision, bd, bf16_r=False):
    """Frozen-topics step, grid (j, i) with the whole B in VMEM.  vs the
    shipped i-outer refit: wz is read once per column strip instead of once
    per (i, j) visit — the kp-proportional traffic drops from grid_i*kp*m*4
    to grid_j*n*kp*4 (about half at 20NG shape) and B never touches HBM
    until the final writeback."""

    def kernel(x_ref, zd_ref, wz_ref, w_ref, b_ref, ll_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        x = x_ref[:].astype(jnp.float32)
        zd = zd_ref[:]
        wz = wz_ref[:]
        s = _dot(zd, wz, ((1,), (0,)), precision)
        s_safe = jnp.maximum(s, _TINY)
        if bf16_r:
            r = x_ref[:].astype(jnp.bfloat16) / s_safe.astype(jnp.bfloat16)
            b_tile = _dot(r, wz.astype(jnp.bfloat16), ((1,), (1,)), precision)
        else:
            r = x / s_safe
            b_tile = _dot(r, wz, ((1,), (1,)), precision)

        rows = pl.ds(i * bd, bd)

        @pl.when(j == 0)
        def _():
            b_ref[rows, :] = b_tile

        @pl.when(j > 0)
        def _():
            b_ref[rows, :] = b_ref[rows, :] + b_tile

        if compute_ll:
            ll_tile = jnp.sum(x * jnp.log(s_safe) * w_ref[:])
            _accumulate_scalar_first(
                ll_ref, ll_tile, jnp.logical_and(i == 0, j == 0)
            )
        else:
            _accumulate_scalar_first(
                ll_ref, jnp.float32(0.0), jnp.logical_and(i == 0, j == 0)
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("variant", "bd", "bw", "compute_ll", "precision_key")
)
def _fused_refit_call_variant(X, zd, wz, w, variant, bd, bw, compute_ll=True,
                              precision_key="default"):
    n, m = X.shape
    kp = zd.shape[1]
    grid = (m // bw, n // bd)
    precision = _resolve_precision(precision_key)
    b_acc, ll = pl.pallas_call(
        _make_refit_kernel_jo_resident(compute_ll, precision, bd,
                                       bf16_r=variant == "jo_res_bf16r"),
        grid=grid,
        in_specs=_jo_in_specs(bd, bw, kp),
        out_specs=[
            pl.BlockSpec((n, kp), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=_cost(n, m, kp, transcendentals=n * m if compute_ll else 0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_interpret(),
    )(X, zd, wz, w)
    return b_acc, ll[0, 0]


def refit_accumulator_variant(X, p_z_given_d, p_w_given_z, sample_weight=None,
                              variant="jo_resident", bd=None, bw=None,
                              compute_ll=True, precision="default"):
    """(B, ll) for the frozen-topics step via the j-outer resident layout
    (any variant name maps here for refit; "jo" has no separate refit form)."""
    n, m = X.shape
    bd, bw = pick_block_shape(n, m, bd, bw)
    w = _weights_col(sample_weight, n)
    return _fused_refit_call_variant(
        X, p_z_given_d, p_w_given_z, w, variant, bd, bw,
        compute_ll=compute_ll, precision_key=precision,
    )


def _jo_in_specs(bd, bw, kp):
    # grid ids arrive as (j, i)
    return [
        pl.BlockSpec((bd, bw), lambda j, i: (i, j), memory_space=pltpu.VMEM),  # X
        pl.BlockSpec((bd, kp), lambda j, i: (i, 0), memory_space=pltpu.VMEM),  # zd
        pl.BlockSpec((kp, bw), lambda j, i: (0, j), memory_space=pltpu.VMEM),  # wz
        pl.BlockSpec((bd, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),   # w
    ]


@functools.partial(
    jax.jit, static_argnames=("variant", "bd", "bw", "compute_ll", "precision_key")
)
def _fused_em_call_variant(X, zd, wz, w, variant, bd, bw, compute_ll=True,
                           precision_key="default"):
    n, m = X.shape
    kp = zd.shape[1]
    grid = (m // bw, n // bd)  # j outer, i inner
    precision = _resolve_precision(precision_key)
    cost = _cost(n, m, kp, transcendentals=n * m if compute_ll else 0)

    if variant == "jo":
        if _interpret() and n > bd and m > bw:
            # Pallas interpret mode mishandles input_output_aliases on blocks
            # revisited non-consecutively: with j outer, each aliased B block
            # (i, 0) is revisited once per column strip, so any grid with
            # multiple row AND column blocks silently stale-reads off-TPU
            # (same hazard pallas_batch.py guards; ops/pallas_em.py routes
            # its interpret path through the alias-free jo_resident layout).
            raise NotImplementedError(
                "the aliased 'jo' variant is device-only on multi-block "
                f"grids (n={n} > bd={bd} and m={m} > bw={bw}); use "
                "'jo_resident' off-TPU"
            )
        b_zero = jnp.zeros((n, kp), jnp.float32)
        a_acc, b_acc, ll = pl.pallas_call(
            _make_em_kernel_jo(compute_ll, precision),
            grid=grid,
            in_specs=_jo_in_specs(bd, bw, kp)
            + [pl.BlockSpec((bd, kp), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)],                     # B in
            out_specs=[
                pl.BlockSpec((kp, bw), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),                     # A
                pl.BlockSpec((bd, kp), lambda j, i: (i, 0),
                             memory_space=pltpu.VMEM),                     # B out
                pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                             memory_space=pltpu.SMEM),                     # ll
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kp, m), jnp.float32),
                jax.ShapeDtypeStruct((n, kp), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            input_output_aliases={4: 1},
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
            interpret=_interpret(),
        )(X, zd, wz, w, b_zero)
        return a_acc, b_acc, ll[0, 0]

    if variant in ("jo_resident", "jo_res_bf16r"):
        a_acc, b_acc, ll = pl.pallas_call(
            _make_em_kernel_jo_resident(compute_ll, precision, bd,
                                        bf16_r=variant == "jo_res_bf16r"),
            grid=grid,
            in_specs=_jo_in_specs(bd, bw, kp),
            out_specs=[
                pl.BlockSpec((kp, bw), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),                     # A
                pl.BlockSpec((n, kp), lambda j, i: (0, 0),
                             memory_space=pltpu.VMEM),                     # B whole
                pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                             memory_space=pltpu.SMEM),                     # ll
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kp, m), jnp.float32),
                jax.ShapeDtypeStruct((n, kp), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
            interpret=_interpret(),
        )(X, zd, wz, w)
        return a_acc, b_acc, ll[0, 0]

    raise ValueError(f"unknown variant {variant!r}")


def em_accumulators_variant(X, p_z_given_d, p_w_given_z, sample_weight=None,
                            variant="jo", bd=None, bw=None, compute_ll=True,
                            precision="default"):
    """Raw ``(A, B, ll)`` accumulators — variant layouts of
    :func:`enstop_tpu.ops.pallas_em.em_accumulators_fused` (same contract;
    A/B expected bit-identical, ll reduction order differs)."""
    n, m = X.shape
    bd, bw = pick_block_shape(n, m, bd, bw)
    w = _weights_col(sample_weight, n)
    return _fused_em_call_variant(
        X, p_z_given_d, p_w_given_z, w, variant, bd, bw,
        compute_ll=compute_ll, precision_key=precision,
    )
