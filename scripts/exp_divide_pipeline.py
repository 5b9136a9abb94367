"""TPU experiment: can the E-step's f32 VPU divide pipeline be cheapened
without giving up f32-accurate responsibilities?

Round-5 hardware sweep (logs/tpu_queue_r5/) localized the shipped kernel's
residual over the 1.89 ms MXU floor in the f32 ratio pipeline: the lossy
``jo_res_bf16r`` variant (bf16 divide, no f32 cast-up of X, no cast-down
before the MXU) wins 12-20% at the k=20 headline.  This probes the middle
ground on real hardware — same jo_resident grid/layout, only the ratio
math varies:

  f32div       r = f32(x) / s                      (baseline == jo_resident)
  recip_mul    r = f32(x) * (1.0 / s)              (does Mosaic lower 1/x
                                                    cheaper than the div?)
  lax_recip    r = f32(x) * lax.reciprocal(s)
  nr1          y0 = bf16-reciprocal of s, one f32 Newton step
               r = f32(x) * y1                     (~16-bit accurate ratio)
  nr2          two Newton steps (~f32-accurate ratio, no f32 divide)
  bf16recip_x32  r = f32(x) * f32(bf16 1/s)        (lossy like bf16r but X
                                                    stays exact)
  bf16r        reference point (= jo_res_bf16r tile math)

For each: accumulator accuracy vs the f32div baseline (max rel diff on A/B),
then a compiled 20-step EM loop timed to a host transfer, best of 3.
Run ONLY on a live relay: python scripts/exp_divide_pipeline.py [k ...]
"""

import sys
import time

import numpy as np


def _make_tile_math(mode):
    import jax.numpy as jnp
    from jax import lax

    from enstop_tpu.ops.pallas_em_variants import _dot, _TINY

    def tile_math(x_ref, zd_ref, wz_ref, w_ref, precision):
        zd = zd_ref[:]
        wz = wz_ref[:]
        w = w_ref[:]
        s = _dot(zd, wz, ((1,), (0,)), precision)
        s_safe = jnp.maximum(s, _TINY)
        if mode == "bf16r":
            r = x_ref[:].astype(jnp.bfloat16) / s_safe.astype(jnp.bfloat16)
            a_tile = _dot((zd * w).astype(jnp.bfloat16), r, ((0,), (0,)),
                          precision)
            b_tile = _dot(r, wz.astype(jnp.bfloat16), ((1,), (1,)), precision)
            return a_tile, b_tile
        x = x_ref[:].astype(jnp.float32)
        if mode == "f32div":
            r = x / s_safe
        elif mode == "recip_mul":
            r = x * (jnp.float32(1.0) / s_safe)
        elif mode == "lax_recip":
            r = x * lax.reciprocal(s_safe)
        elif mode in ("nr1", "nr2", "bf16recip_x32"):
            y = lax.reciprocal(s_safe.astype(jnp.bfloat16)).astype(jnp.float32)
            if mode in ("nr1", "nr2"):
                y = y * (jnp.float32(2.0) - s_safe * y)
            if mode == "nr2":
                y = y * (jnp.float32(2.0) - s_safe * y)
            r = x * y
        else:
            raise ValueError(mode)
        a_tile = _dot(zd * w, r, ((0,), (0,)), precision)
        b_tile = _dot(r, wz, ((1,), (1,)), precision)
        return a_tile, b_tile

    return tile_math


def _make_em_call(mode, n, m, kp, bd, bw):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from enstop_tpu.ops.pallas_em_variants import (
        _cost, _jo_in_specs, _VMEM_BUDGET, _resolve_precision)

    tile_math = _make_tile_math(mode)
    precision = _resolve_precision("default")

    def kernel(x_ref, zd_ref, wz_ref, w_ref, a_ref, b_ref, ll_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        a_tile, b_tile = tile_math(x_ref, zd_ref, wz_ref, w_ref, precision)

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

        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _():
            ll_ref[0, 0] = jnp.float32(0.0)

    @jax.jit
    def call(X, zd, wz, w):
        a, b, _ = pl.pallas_call(
            kernel,
            grid=(m // bw, n // bd),
            in_specs=_jo_in_specs(bd, bw, kp),
            out_specs=[
                pl.BlockSpec((kp, bw), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, kp), lambda j, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((kp, m), jnp.float32),
                jax.ShapeDtypeStruct((n, kp), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
            cost_estimate=_cost(n, m, kp, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_BUDGET),
        )(X, zd, wz, w)
        return a, b

    return call


MODES = ("f32div", "recip_mul", "lax_recip", "nr1", "nr2",
         "bf16recip_x32", "bf16r")


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), file=sys.stderr)
    if jax.default_backend() != "tpu":
        print("needs the real device; aborting", file=sys.stderr)
        return 1

    sys.path.insert(0, ".")
    from bench import synthetic_20ng
    from enstop_tpu.ops import pallas_em
    from enstop_tpu.ops.data import pad_factors
    from enstop_tpu.ops.driver import prepare_counts
    from enstop_tpu.ops.init import plsa_init

    ks = [int(a) for a in sys.argv[1:]] or [20]
    X = synthetic_20ng()
    prep = prepare_counts(X)
    Xd = prep.device_array
    n_pad, m_pad = Xd.shape
    bd, bw = pallas_em.pick_block_shape(n_pad, m_pad)
    N_STEPS = 20
    TINY = 1e-30

    def make_loop(accum):
        @jax.jit
        def run(X_, zd_, wz_, w_, n_steps):
            def body(_, state):
                zd_c, wz_c = state
                a, b = accum(X_, zd_c, wz_c, w_)
                num = wz_c * a
                wz_n = num / jnp.maximum(num.sum(1, keepdims=True), TINY)
                num = zd_c * b
                zd_n = num / jnp.maximum(num.sum(1, keepdims=True), TINY)
                return zd_n, wz_n

            return jax.lax.fori_loop(0, n_steps, body, (zd_, wz_))

        return run

    results = {}
    for k in ks:
        zd0, wz0 = plsa_init(X, k, rng=np.random.RandomState(1))
        zd, wz = pad_factors(zd0, wz0, n_pad, m_pad)
        zd, wz = jnp.asarray(zd), jnp.asarray(wz)
        kp = zd.shape[1]
        w = jnp.ones((n_pad, 1), jnp.float32)

        # single-step accuracy vs the f32div baseline
        calls = {mode: _make_em_call(mode, n_pad, m_pad, kp, bd, bw)
                 for mode in MODES}
        a0, b0 = (np.asarray(o) for o in calls["f32div"](Xd, zd, wz, w))
        for mode in MODES:
            a1, b1 = (np.asarray(o) for o in calls[mode](Xd, zd, wz, w))
            da = np.abs(a1 - a0).max() / max(np.abs(a0).max(), 1e-30)
            db = np.abs(b1 - b0).max() / max(np.abs(b0).max(), 1e-30)
            print(f"k{k}/{mode}: rel maxdiff A={da:.3e} B={db:.3e}"
                  + ("  (bit-identical)" if da == 0 and db == 0 else ""),
                  file=sys.stderr)

        for mode in MODES:
            loop = make_loop(calls[mode])
            key = f"k{k}/{mode}"
            try:
                t0 = time.time()
                out = loop(Xd, zd, wz, w, jnp.int32(N_STEPS))
                _ = np.asarray(out[0][:1, :1])
                compile_s = time.time() - t0
                walls = []
                for _rep in range(3):
                    t0 = time.time()
                    out = loop(Xd, zd, wz, w, jnp.int32(N_STEPS))
                    _ = np.asarray(out[0][:1, :1])
                    walls.append(time.time() - t0)
                per_iter_ms = min(walls) / N_STEPS * 1e3
                results[key] = per_iter_ms
                print(f"{key}: {per_iter_ms:.3f} ms/iter "
                      f"(compile {compile_s:.1f}s, walls "
                      f"{[round(w_, 3) for w_ in walls]})", file=sys.stderr)
            except Exception as e:
                print(f"{key}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr)
        base = results.get(f"k{k}/f32div")
        if base:
            for mode in MODES:
                v = results.get(f"k{k}/{mode}")
                if v:
                    print(f"k{k}/{mode}: {v:.3f} ms/iter  "
                          f"speedup_vs_f32div={base / v:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
