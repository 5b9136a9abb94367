"""Fused Pallas TPU kernel for the pLSA EM step.

One pass over the (zero-padded, dense-blocked) count matrix computes, per (Bd, Bw)
tile, entirely in VMEM:

    S  = zd_blk @ wz_blk          (MXU)           predicted P(w|d) on the tile
    R  = X / S   where X > 0      (VPU)
    A += (w ⊙ zd_blk)^T @ R       (MXU)           P(w|z) update accumulator (k, m)
    B += R @ wz_blk^T             (MXU)           P(z|d) update accumulator (n, k)
    ll += Σ w ⊙ X ⊙ log S         (VPU reduce; optional — only needed at test points)

so the data matrix is read from HBM exactly once per EM iteration and the reference's
``(nnz, k)`` responsibilities array (plsa.py:586) never exists anywhere.  This is the
TPU-native replacement for the reference's four kernel families (flat numba
plsa.py:25-386, streamed, 2D-blocked, and numba-CUDA cuda_plsa.py:22-154): the 2D
grid here is the blocked variant's (i, j) tile loop (block_parallel_plsa.py:156-180)
compiled onto the MXU, and the cross-tile shard reduction (block_parallel_plsa.py:
182-185) becomes in-VMEM accumulation:

* ``B`` tiles stay resident in VMEM across the inner j-sweep (grid order: j minor)
  and are written back once per row-block;
* ``A`` tiles are revisited non-consecutively, so ``A`` is an input/output-aliased
  HBM accumulator (read-modify-write per tile visit — ~2·k/Bd of the X traffic);
* ``ll`` accumulates in SMEM across the whole grid.

Factor normalization happens outside the kernel on (k, m)/(n, k) arrays — negligible
traffic, and XLA fuses the multiply+normalize chains.

The EM fit loop only consults the log-likelihood every ``n_iter_per_test``
iterations (plsa.py:630-638), so the default step kernel skips the transcendental
``log`` sweep entirely (``compute_ll=False``); the dedicated LL kernel runs at test
points.  Matmul precision defaults to "default" (bf16 multiplies, f32
accumulation): a full 20NG-scale fit reaches the same optimum as HIGHEST
(final log-likelihood within 4e-5 relative) at ~2x the step throughput;
pass ``precision="highest"`` for strict f32 parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30

# Default tile sizes, picked empirically on v5e at 20NG scale (see
# scripts/exp_kernel_variants.py): 512x1024 with the mask-free E-step measures
# 4.26 ms/iter vs 4.95 for the round-1 256x1024 masked kernel (+16%) — taller
# tiles halve the aliased-A read-modify-write traffic (2*kp/Bd of the X stream).
_DEFAULT_BD = 512
_DEFAULT_BW = 1024
_VMEM_BUDGET = 96 * 1024 * 1024


def pick_block_shape(n, m, bd=None, bw=None):
    """Row/col tile sizes (also the padding multiples for the data layout)."""
    bd = bd or min(_DEFAULT_BD, -(-max(n, 1) // 16) * 16)
    bw = bw or min(_DEFAULT_BW, -(-max(m, 1) // 128) * 128)
    return bd, bw


def _interpret():
    return jax.default_backend() != "tpu"


def _env_kernel_variant():
    """Tri-state env override: ``None`` (unset — the measured table decides,
    see :func:`_measured_variant`), ``"shipped"`` (explicitly force the
    shipped i-outer kernel, bypassing the table), or a validated variant
    name.  The env switch is an OVERRIDE; auto-selection is the default
    (VERDICT r03 item 3)."""
    import os

    v = os.environ.get("ENSTOP_EM_KERNEL", "").strip().lower()
    if not v:
        return None
    if v in ("default", "shipped"):
        return "shipped"
    from .pallas_em_variants import VARIANTS

    if v not in VARIANTS:
        raise ValueError(
            f"ENSTOP_EM_KERNEL={v!r} unknown (choose from {VARIANTS})"
        )
    return v


def _measured_variant(k, n=None):
    """Measured-best grid layout for this k on the real device, or ``None``
    for the shipped kernel.  Only consults the hardware-measured table
    (enstop_tpu/data/kernel_measured.json, written by
    scripts/exp_kernel_v3.py) — predictions never pick the default.
    ``n`` (padded doc rows) gates the VMEM-resident layouts at large n.
    Interpret-mode execution keeps the deterministic alias-free routing
    below instead."""
    if _interpret():
        return None
    from .kernel_select import measured_best_variant

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    return measured_best_variant(int(k), kind, n=n)


def _fast_variant(k, n):
    """The bf16-responsibilities layout for ``precision="fast"``, when its
    VMEM-resident ``(n, kp)`` B accumulator fits the kernel budget; ``None``
    (caller falls through to the normal resolution at DEFAULT matmul
    precision) when it does not."""
    from .kernel_select import _RESIDENT_B_BUDGET_BYTES

    kp = -(-max(int(k), 1) // 8) * 8
    if n is not None and int(n) * kp * 4 > _RESIDENT_B_BUDGET_BYTES:
        import warnings

        warnings.warn(
            "precision='fast' needs the whole (n, k) document accumulator "
            f"resident in VMEM; n={n}, k={k} exceeds the budget — running "
            "the exact f32-responsibilities kernel at DEFAULT matmul "
            "precision instead",
            stacklevel=4,
        )
        return None
    return "jo_res_bf16r"


def _resolve_variant(k, n=None, precision=None):
    """env override > precision="fast" request > measured table > shipped
    (None)."""
    v = _env_kernel_variant()
    if v == "shipped":
        return None
    if v is not None:
        return v
    if precision == "fast":
        fast = _fast_variant(k, n)
        if fast is not None:
            return fast
    return _measured_variant(k, n=n)


def _resolve_precision(precision):
    if precision in (None, "highest"):
        return jax.lax.Precision.HIGHEST
    # "fast" = DEFAULT matmul precision + the bf16-responsibilities kernel
    # layout (resolved in _resolve_variant); by the time the matmul precision
    # matters they are the same bf16 MXU inputs.
    if precision in ("default", "fast"):
        return jax.lax.Precision.DEFAULT
    return precision


def _dot(a, b, dims, precision):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _accumulate_scalar(ll_ref, value, i, j):
    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        ll_ref[0, 0] = value

    @pl.when(jnp.logical_or(i > 0, j > 0))
    def _():
        ll_ref[0, 0] = ll_ref[0, 0] + value


def _make_em_kernel(compute_ll, precision):
    def kernel(x_ref, zd_ref, wz_ref, w_ref, a_in_ref, a_out_ref, b_ref, ll_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        x = x_ref[:].astype(jnp.float32)
        zd = zd_ref[:]
        wz = wz_ref[:]
        w = w_ref[:]  # (Bd, 1) per-document weights

        s = _dot(zd, wz, ((1,), (0,)), precision)
        s_safe = jnp.maximum(s, _TINY)
        # Mask-free: x == 0 -> r == 0 exactly (s_safe >= 1e-30 > 0).  When s is
        # tiny but the per-topic products are nonzero, the huge r is the
        # *intended* mathematics — r * wz reconstructs the normalized
        # responsibility x * v_z / s, exactly like the reference's per-entry
        # normalize (plsa.py:97-104); cannot overflow f32 (x <= 1e4 counts ->
        # r <= 1e34 < f32 max).  When s == 0 outright (all products flushed or
        # a dead word column) every r * wz product is 0.  Dropping the
        # compare+select saves two VPU passes: measured 4.46 -> 4.26 ms/iter
        # at 20NG scale, bit-identical factors (scripts/exp_kernel_variants.py).
        r = x / s_safe

        a_tile = _dot(zd * w, r, ((0,), (0,)), precision)   # (kp, Bw)
        b_tile = _dot(r, wz, ((1,), (1,)), precision)       # (Bd, kp)

        # A: aliased HBM accumulator, read-modify-write on every visit.
        a_out_ref[:] = a_in_ref[:] + a_tile

        # B: resident across the j-sweep for this row block.
        @pl.when(j == 0)
        def _():
            b_ref[:] = b_tile

        @pl.when(j > 0)
        def _():
            b_ref[:] = b_ref[:] + b_tile

        if compute_ll:
            # x == 0 kills the term; log(s_safe) is finite by construction.
            ll_tile = jnp.sum(x * jnp.log(s_safe) * w)
            _accumulate_scalar(ll_ref, ll_tile, i, j)
        else:
            _accumulate_scalar(ll_ref, jnp.float32(0.0), i, j)

    return kernel


def _make_refit_kernel(compute_ll, precision):
    def kernel(x_ref, zd_ref, wz_ref, w_ref, b_ref, ll_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        x = x_ref[:].astype(jnp.float32)
        zd = zd_ref[:]
        wz = wz_ref[:]

        s = _dot(zd, wz, ((1,), (0,)), precision)
        s_safe = jnp.maximum(s, _TINY)
        r = x / s_safe  # mask-free, see the EM kernel note
        b_tile = _dot(r, wz, ((1,), (1,)), precision)

        @pl.when(j == 0)
        def _():
            b_ref[:] = b_tile

        @pl.when(j > 0)
        def _():
            b_ref[:] = b_ref[:] + b_tile

        if compute_ll:
            ll_tile = jnp.sum(x * jnp.log(s_safe) * w_ref[:])
            _accumulate_scalar(ll_ref, ll_tile, i, j)
        else:
            _accumulate_scalar(ll_ref, jnp.float32(0.0), i, j)

    return kernel


def _make_ll_kernel(precision):
    def kernel(x_ref, zd_ref, wz_ref, w_ref, ll_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x = x_ref[:].astype(jnp.float32)
        s = _dot(zd_ref[:], wz_ref[:], ((1,), (0,)), precision)
        ll_tile = jnp.sum(x * jnp.log(jnp.maximum(s, _TINY)) * w_ref[:])
        _accumulate_scalar(ll_ref, ll_tile, i, j)

    return kernel


def _common_in_specs(bd, bw, kp):
    return [
        pl.BlockSpec((bd, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),   # X
        pl.BlockSpec((bd, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),   # zd
        pl.BlockSpec((kp, bw), lambda i, j: (0, j), memory_space=pltpu.VMEM),   # wz
        pl.BlockSpec((bd, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),    # w
    ]


def _cost(n, m, kp, transcendentals):
    return pl.CostEstimate(
        flops=3 * 2 * n * m * kp,
        bytes_accessed=n * m * 4 + 2 * (n * kp + kp * m) * 4,
        transcendentals=transcendentals,
    )


@functools.partial(jax.jit, static_argnames=("bd", "bw", "compute_ll", "precision_key"))
def _fused_em_call(X, zd, wz, w, bd, bw, compute_ll=True, precision_key="highest"):
    n, m = X.shape
    kp = zd.shape[1]
    grid = (n // bd, m // bw)
    a_zero = jnp.zeros((kp, m), jnp.float32)
    precision = _resolve_precision(precision_key)

    a_acc, b_acc, ll = pl.pallas_call(
        _make_em_kernel(compute_ll, precision),
        grid=grid,
        in_specs=_common_in_specs(bd, bw, kp)
        + [pl.BlockSpec((kp, bw), lambda i, j: (0, j), memory_space=pltpu.VMEM)],  # A in
        out_specs=[
            pl.BlockSpec((kp, bw), lambda i, j: (0, j), memory_space=pltpu.VMEM),  # A out
            pl.BlockSpec((bd, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),    # ll
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, m), jnp.float32),
            jax.ShapeDtypeStruct((n, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={4: 0},
        cost_estimate=_cost(n, m, kp, transcendentals=n * m if compute_ll else 0),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_interpret(),
    )(X, zd, wz, w, a_zero)
    return a_acc, b_acc, ll[0, 0]


def _weights_col(sample_weight, n):
    if sample_weight is None:
        return jnp.ones((n, 1), jnp.float32)
    return sample_weight.reshape(n, 1).astype(jnp.float32)


def em_accumulators_fused(X, p_z_given_d, p_w_given_z, sample_weight=None,
                          bd=None, bw=None, compute_ll=True, precision="default"):
    """Raw ``(A, B, ll)`` accumulators from the fused kernel (pre-normalization);
    used by the mesh-sharded backend which psums these across devices."""
    n, m = X.shape
    bd, bw = pick_block_shape(n, m, bd, bw)
    w = _weights_col(sample_weight, n)
    variant = _resolve_variant(p_z_given_d.shape[1], n=n, precision=precision)
    if variant:
        # Grid-layout variant: either the ENSTOP_EM_KERNEL override (lets
        # bench.py / the TPU queue measure a candidate through the
        # PRODUCTION fit programs with no code change; read at trace time)
        # or the measured-best auto-selection for this k
        # (enstop_tpu/data/kernel_measured.json).
        from .pallas_em_variants import em_accumulators_variant

        if variant == "jo" and _interpret():
            # the aliased jo layout is device-only (interpret mode stale-reads
            # revisited aliased blocks — see below); jo_resident is the same
            # grid order with an alias-free B, bit-identical results.  This
            # keeps a CPU re-exec of an ENSTOP_EM_KERNEL=jo bench correct.
            variant = "jo_resident"
        return em_accumulators_variant(
            X, p_z_given_d, p_w_given_z, sample_weight=sample_weight,
            variant=variant, bd=bd, bw=bw, compute_ll=compute_ll,
            precision=precision,
        )
    if _interpret() and n > bd:
        # Pallas INTERPRET mode mishandles input_output_aliases on blocks
        # revisited non-consecutively (stale reads of the aliased input), so
        # the aliased-A layout silently corrupts A whenever the grid has more
        # than one row block.  Route interpret execution through the
        # alias-free resident-B layout — identical per-tile math and
        # accumulation order, so the factors are bit-identical.  Real-TPU
        # execution keeps the aliased layout (device-validated; VMEM-bounded).
        from .pallas_em_variants import em_accumulators_variant

        return em_accumulators_variant(
            X, p_z_given_d, p_w_given_z, sample_weight=sample_weight,
            variant="jo_resident", bd=bd, bw=bw, compute_ll=compute_ll,
            precision=precision,
        )
    return _fused_em_call(X, p_z_given_d, p_w_given_z, w, bd, bw,
                          compute_ll=compute_ll, precision_key=precision)


def em_step_fused(X, p_z_given_d, p_w_given_z, sample_weight=None, bd=None, bw=None,
                  compute_ll=True, precision="default"):
    """Drop-in fused equivalent of :func:`enstop_tpu.ops.em.em_step_dense`.

    ``X`` must be padded to multiples of the block shape (see
    :func:`pick_block_shape`); padding rows/cols/topics are absorbing zeros.
    With ``compute_ll=False`` the returned scalar is 0.0 and the log sweep is
    skipped (the fit loop only needs LL at test points).
    """
    a_acc, b_acc, ll = em_accumulators_fused(
        X, p_z_given_d, p_w_given_z, sample_weight, bd, bw, compute_ll, precision
    )
    next_wz = p_w_given_z * a_acc
    next_wz = next_wz / jnp.maximum(next_wz.sum(axis=1, keepdims=True), _TINY)
    next_zd = p_z_given_d * b_acc
    next_zd = next_zd / jnp.maximum(next_zd.sum(axis=1, keepdims=True), _TINY)
    return next_zd, next_wz, ll


@functools.partial(jax.jit, static_argnames=("bd", "bw", "compute_ll", "precision_key"))
def _fused_refit_call(X, zd, wz, w, bd, bw, compute_ll=True, precision_key="highest"):
    n, m = X.shape
    kp = zd.shape[1]
    grid = (n // bd, m // bw)
    precision = _resolve_precision(precision_key)
    b_acc, ll = pl.pallas_call(
        _make_refit_kernel(compute_ll, precision),
        grid=grid,
        in_specs=_common_in_specs(bd, bw, kp),
        out_specs=[
            pl.BlockSpec((bd, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
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


def refit_step_fused(X, p_z_given_d, p_w_given_z, sample_weight=None, bd=None, bw=None,
                     compute_ll=True, precision="default"):
    """Frozen-topics EM step (only P(z|d) updates); fused analog of
    :func:`enstop_tpu.ops.em.refit_step_dense`."""
    n, m = X.shape
    bd, bw = pick_block_shape(n, m, bd, bw)
    w = _weights_col(sample_weight, n)
    refit_variant = _resolve_variant(p_z_given_d.shape[1], n=n, precision=precision)
    if refit_variant:
        from .pallas_em_variants import refit_accumulator_variant

        b_acc, ll = refit_accumulator_variant(
            X, p_z_given_d, p_w_given_z, sample_weight=sample_weight,
            variant=refit_variant, bd=bd, bw=bw,
            compute_ll=compute_ll, precision=precision,
        )
    else:
        b_acc, ll = _fused_refit_call(X, p_z_given_d, p_w_given_z, w, bd, bw,
                                      compute_ll=compute_ll, precision_key=precision)
    next_zd = p_z_given_d * b_acc
    next_zd = next_zd / jnp.maximum(next_zd.sum(axis=1, keepdims=True), _TINY)
    return next_zd, ll


@functools.partial(jax.jit, static_argnames=("bd", "bw", "precision_key"))
def _fused_ll_call(X, zd, wz, w, bd, bw, precision_key="highest"):
    n, m = X.shape
    kp = zd.shape[1]
    grid = (n // bd, m // bw)
    ll = pl.pallas_call(
        _make_ll_kernel(_resolve_precision(precision_key)),
        grid=grid,
        in_specs=_common_in_specs(bd, bw, kp),
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=_cost(n, m, kp, transcendentals=n * m),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET),
        interpret=_interpret(),
    )(X, zd, wz, w)
    return ll[0, 0]


def log_likelihood_fused(X, p_z_given_d, p_w_given_z, sample_weight=None,
                         bd=None, bw=None, precision="default"):
    n, m = X.shape
    bd, bw = pick_block_shape(n, m, bd, bw)
    w = _weights_col(sample_weight, n)
    return _fused_ll_call(X, p_z_given_d, p_w_given_z, w, bd, bw, precision_key=precision)
