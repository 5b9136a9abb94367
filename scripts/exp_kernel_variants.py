"""Round-2 perf experiments on the fused EM kernel (run on the real TPU).

Variants at 20NG scale (18846x25000, nnz~2.2M, k=20, bf16 X):
  1. shipped kernel (masked r, separate LL at test points)
  2. mask-free r = x / max(s, TINY)   (drops compare+select VPU passes)
  3. LL folded into the last step of each test chunk (no separate LL sweep)
  4. tile-shape sweep

Timing: host-transfer sync (np.asarray), per CLAUDE.md (block_until_ready is
unreliable on this backend).
"""
import functools
import sys, time
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from enstop_tpu.ops import pallas_em
from enstop_tpu.ops.pallas_em import (
    _TINY, _accumulate_scalar, _common_in_specs, _cost, _dot, _resolve_precision,
)
from enstop_tpu.ops.data import round_up

N_DOCS, N_WORDS, K, NNZ = 18846, 25000, 20, 2200000


def make_inputs(bd, bw, x_dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    npad, mpad = round_up(N_DOCS, bd), round_up(N_WORDS, bw)
    kp = round_up(K, 8)
    X = np.zeros((npad, mpad), np.float32)
    ridx = rng.randint(0, N_DOCS, NNZ)
    cidx = rng.randint(0, N_WORDS, NNZ)
    np.add.at(X, (ridx, cidx), 1.0 + rng.poisson(1.5, NNZ))
    zd0 = rng.rand(npad, kp).astype(np.float32)
    zd0[N_DOCS:] = 0; zd0[:, K:] = 0
    zd0 /= np.maximum(zd0.sum(1, keepdims=True), 1e-30)
    wz0 = rng.rand(kp, mpad).astype(np.float32)
    wz0[K:] = 0; wz0[:, N_WORDS:] = 0
    wz0 /= np.maximum(wz0.sum(1, keepdims=True), 1e-30)
    w = np.ones((npad, 1), np.float32); w[N_DOCS:] = 0
    return (jnp.asarray(X, x_dtype), jnp.asarray(zd0), jnp.asarray(wz0),
            jnp.asarray(w))


# --- mask-free kernel variant ------------------------------------------------

def _make_em_kernel_nomask(compute_ll, precision):
    def kernel(x_ref, zd_ref, wz_ref, w_ref, a_in_ref, a_out_ref, b_ref, ll_ref):
        i = pl.program_id(0); j = pl.program_id(1)
        x = x_ref[:].astype(jnp.float32)
        zd = zd_ref[:]; wz = wz_ref[:]; w = w_ref[:]
        s = _dot(zd, wz, ((1,), (0,)), precision)
        s_safe = jnp.maximum(s, _TINY)
        r = x / s_safe                       # x==0 -> 0 exactly; no compare/select
        a_tile = _dot(zd * w, r, ((0,), (0,)), precision)
        b_tile = _dot(r, wz, ((1,), (1,)), precision)
        a_out_ref[:] = a_in_ref[:] + a_tile

        @pl.when(j == 0)
        def _(): b_ref[:] = b_tile
        @pl.when(j > 0)
        def _(): b_ref[:] = b_ref[:] + b_tile

        if compute_ll:
            ll_tile = jnp.sum(x * jnp.log(s_safe) * w)
            _accumulate_scalar(ll_ref, ll_tile, i, j)
        else:
            _accumulate_scalar(ll_ref, jnp.float32(0.0), i, j)
    return kernel


@functools.partial(jax.jit, static_argnames=("bd", "bw", "compute_ll", "variant"))
def em_call(X, zd, wz, w, bd, bw, compute_ll=False, variant="shipped"):
    n, m = X.shape
    kp = zd.shape[1]
    grid = (n // bd, m // bw)
    a_zero = jnp.zeros((kp, m), jnp.float32)
    precision = _resolve_precision("default")
    maker = (pallas_em._make_em_kernel if variant == "shipped"
             else _make_em_kernel_nomask)
    a_acc, b_acc, ll = pl.pallas_call(
        maker(compute_ll, precision),
        grid=grid,
        in_specs=_common_in_specs(bd, bw, kp)
        + [pl.BlockSpec((kp, bw), lambda i, j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((kp, bw), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bd, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, m), jnp.float32),
            jax.ShapeDtypeStruct((n, kp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={4: 0},
        cost_estimate=_cost(n, m, kp, transcendentals=n * m if compute_ll else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pallas_em._VMEM_BUDGET),
    )(X, zd, wz, w, a_zero)
    next_wz = wz * a_acc
    next_wz = next_wz / jnp.maximum(next_wz.sum(axis=1, keepdims=True), _TINY)
    next_zd = zd * b_acc
    next_zd = next_zd / jnp.maximum(next_zd.sum(axis=1, keepdims=True), _TINY)
    return next_zd, next_wz, ll[0, 0]


def time_steps(fn, X, zd, wz, w, iters=40, label=""):
    z, v, ll = fn(X, zd, wz, w)     # compile+warm
    _ = np.asarray(z)
    t0 = time.time()
    z, v = zd, wz
    for _ in range(iters):
        z, v, ll = fn(X, z, v, w)
    _ = np.asarray(z)               # hard sync
    dt = (time.time() - t0) / iters
    print(f"{label:48s} {dt*1e3:7.3f} ms/iter  {NNZ*K/dt/1e9:6.2f} Gupd/s",
          flush=True)
    return dt


def main():
    print("# backend:", jax.default_backend(), flush=True)

    for variant in ("shipped", "nomask"):
        for (bd, bw) in ((256, 1024), (512, 1024), (256, 2048), (512, 2048), (512, 512)):
            X, zd, wz, w = make_inputs(bd, bw)
            fn = lambda X, z, v, w, bd=bd, bw=bw, variant=variant: em_call(
                X, z, v, w, bd, bw, compute_ll=False, variant=variant)
            time_steps(fn, X, zd, wz, w, label=f"{variant} bd={bd} bw={bw} no-ll")

    # LL handling at a test chunk: 10 steps + separate LL sweep vs 9 steps +
    # 1 LL-folded step
    bd, bw = 256, 1024
    X, zd, wz, w = make_inputs(bd, bw)

    @jax.jit
    def chunk_separate(X, zd, wz, w):
        def body(_, s):
            z, v, _ = em_call(X, s[0], s[1], w, bd, bw, False, "nomask")
            return (z, v)
        zd, wz = jax.lax.fori_loop(0, 10, body, (zd, wz))
        ll = pallas_em.log_likelihood_fused(X, zd, wz, sample_weight=w[:, 0])
        return zd, wz, ll

    @jax.jit
    def chunk_folded(X, zd, wz, w):
        def body(_, s):
            z, v, _ = em_call(X, s[0], s[1], w, bd, bw, False, "nomask")
            return (z, v)
        zd, wz = jax.lax.fori_loop(0, 9, body, (zd, wz))
        zd, wz, ll = em_call(X, zd, wz, w, bd, bw, True, "nomask")
        return zd, wz, ll   # ll is LL of the state after 9 steps

    for fn, label in ((chunk_separate, "chunk: 10 steps + LL sweep"),
                      (chunk_folded, "chunk: 9 steps + LL-folded step")):
        z, v, ll = fn(X, zd, wz, w); _ = np.asarray(z)
        t0 = time.time()
        z, v = zd, wz
        for _ in range(8):
            z, v, ll = fn(X, z, v, w)
        _ = np.asarray(z)
        dt = (time.time() - t0) / 8
        print(f"{label:48s} {dt*1e3:7.2f} ms/chunk", flush=True)

    # numeric parity of nomask vs shipped at f32 HIGHEST on the same inputs
    Xf, zdf, wzf, wf = make_inputs(256, 1024, x_dtype=jnp.float32)
    z1, v1, _ = em_call(Xf, zdf, wzf, wf, 256, 1024, False, "shipped")
    z2, v2, _ = em_call(Xf, zdf, wzf, wf, 256, 1024, False, "nomask")
    print("nomask vs shipped: max |dzd| =", float(jnp.abs(z1 - z2).max()),
          " max |dwz| =", float(jnp.abs(v1 - v2).max()))


if __name__ == "__main__":
    main()
