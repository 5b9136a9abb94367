"""TPU sweep: round-3 EM-kernel grid layouts vs the shipped kernel.

Traffic analysis (ops/pallas_em_variants.py docstring) predicts the shipped
i-outer layout is HBM-bound on aliased-A RMW + wz re-reads (~2.45 GB/iter at
20NG scale) and that the j-outer layouts cut this to ~1.7 GB ("jo") /
~1.26 GB ("jo_resident", needs n*kp*4 B of VMEM for the resident B).

Run ONLY on a live relay:  python scripts/exp_kernel_v3.py
For each variant: device parity vs the shipped kernel (A/B expected
bit-identical — same per-tile math and accumulation order), then a
20-iteration compiled loop timed to a host transfer, best of 3.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), file=sys.stderr)

    sys.path.insert(0, ".")
    from bench import synthetic_20ng
    from enstop_tpu.ops import pallas_em
    from enstop_tpu.ops.pallas_em_variants import VARIANTS, em_accumulators_variant
    from enstop_tpu.ops.driver import prepare_counts
    from enstop_tpu.ops.data import pad_factors
    from enstop_tpu.ops.init import plsa_init

    # ---- device parity at moderate scale (multi-block grid) --------------
    rng = np.random.default_rng(0)
    n_s, m_s, k_s = 2048, 4096, 20
    Xs = ((rng.random((n_s, m_s)) < 0.05) * rng.integers(1, 5, (n_s, m_s))
          ).astype(np.float32)
    import scipy.sparse as sp

    zd0, wz0 = plsa_init(sp.csr_matrix(Xs), k_s, rng=np.random.RandomState(1))
    bd, bw = pallas_em.pick_block_shape(n_s, m_s)
    zd, wz = pad_factors(zd0, wz0, n_s, m_s)
    Xd = jnp.asarray(Xs)
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)

    a0, b0, ll0 = pallas_em.em_accumulators_fused(Xd, zd, wz, bd=bd, bw=bw)
    a0, b0 = np.asarray(a0), np.asarray(b0)
    # Parity gates TABLE ELIGIBILITY: a variant may only become the measured
    # auto-selection default (enstop_tpu/data/kernel_measured.json) if its
    # accumulators match the shipped kernel bit-for-bit on device.  This
    # excludes jo_res_bf16r by design (bf16 responsibilities are lossy — it
    # stays an explicit ENSTOP_EM_KERNEL opt-in) and any variant whose
    # Mosaic lowering misbehaves on real hardware.
    parity_ok = {}
    for v in VARIANTS:
        try:
            a1, b1, ll1 = em_accumulators_variant(Xd, zd, wz, variant=v,
                                                  bd=bd, bw=bw)
            da = np.abs(np.asarray(a1) - a0).max()
            db = np.abs(np.asarray(b1) - b0).max()
            dll = abs(float(ll1) - float(ll0))
            parity_ok[v] = bool(da == 0 and db == 0)
            status = "BIT-IDENTICAL" if parity_ok[v] else "DIFFERS"
            print(f"parity {v}: maxdiff A={da} B={db} ll={dll} -> {status}",
                  file=sys.stderr)
        except Exception as e:
            parity_ok[v] = False
            print(f"parity {v}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)

    # ---- timing at 20NG shape, k in {20, 100, 200} ------------------------
    # k=20 is the headline config (expected near-tied: the accumulator
    # traffic is minor at kp=24); k=100/200 are the BASELINE envelope
    # configs where A-RMW + wz re-reads scale with kp and the j-outer
    # layouts should win (see ops/pallas_em_variants.py docstring).
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
                a, b, _ = accum(X_, zd_c, wz_c, w_)
                num = wz_c * a
                wz_n = num / jnp.maximum(num.sum(1, keepdims=True), TINY)
                num = zd_c * b
                zd_n = num / jnp.maximum(num.sum(1, keepdims=True), TINY)
                return zd_n, wz_n

            return jax.lax.fori_loop(0, n_steps, body, (zd_, wz_))

        return run

    def accum_shipped(X_, zd_, wz_, w_):
        return pallas_em._fused_em_call(X_, zd_, wz_, w_, bd, bw,
                                        compute_ll=False,
                                        precision_key="default")

    def accum_variant(v):
        def f(X_, zd_, wz_, w_):
            from enstop_tpu.ops.pallas_em_variants import _fused_em_call_variant

            return _fused_em_call_variant(X_, zd_, wz_, w_, v, bd, bw,
                                          compute_ll=False,
                                          precision_key="default")

        return f

    results = {}
    for k in (20, 100, 200):
        zd0, wz0 = plsa_init(X, k, rng=np.random.RandomState(1))
        zd, wz = pad_factors(zd0, wz0, n_pad, m_pad)
        zd, wz = jnp.asarray(zd), jnp.asarray(wz)
        w = jnp.ones((n_pad, 1), jnp.float32)
        for name, accum in [("shipped", accum_shipped)] + [
            (v, accum_variant(v)) for v in VARIANTS
        ]:
            loop = make_loop(accum)
            key = f"k{k}/{name}"
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
                print(f"{key}: {per_iter_ms:.3f} ms/iter (compile "
                      f"{compile_s:.0f}s, walls {['%.3f' % x for x in walls]})",
                      file=sys.stderr)
            except Exception as e:
                results[key] = None
                print(f"{key}: FAILED {type(e).__name__}: {str(e)[:300]}",
                      file=sys.stderr)

    print({"per_iter_ms": results, "bd": bd, "bw": bw,
           "shape": (n_pad, m_pad)})

    # persist the sweep as the measured auto-selection table consumed by
    # ops/kernel_select.py — em_accumulators_fused/refit_step_fused pick the
    # measured-best layout per k from it on the real device (VERDICT r03
    # item 3: only numbers may displace the shipped default, never the
    # traffic-analysis prediction)
    if jax.default_backend() == "tpu":
        import json
        import os

        entries = []
        for k in (20, 100, 200):
            times = {}
            for name in ["shipped"] + list(VARIANTS):
                v = results.get(f"k{k}/{name}")
                if v is None:
                    continue
                if name != "shipped" and not parity_ok.get(name, False):
                    continue  # never auto-select a non-bit-identical kernel
                times[name] = round(v, 4)
            if "shipped" in times:
                entries.append({
                    "k": k,
                    "best": min(times, key=times.get),
                    "per_iter_ms": times,
                })
        table = {
            "device_kind": jax.devices()[0].device_kind,
            "date": time.strftime("%Y-%m-%d"),
            "source": "scripts/exp_kernel_v3.py sweep at 20NG shape "
                      f"({n_pad}x{m_pad}, bd={bd}, bw={bw}, best-of-3 x "
                      f"{N_STEPS}-iter loops); entries exclude variants "
                      "that are not device-bit-identical to shipped",
            "parity_ok": parity_ok,
            "entries": entries,
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "enstop_tpu", "data",
            "kernel_measured.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(table, fh, indent=1)
        print(f"# wrote measured table -> {path}", file=sys.stderr)
    else:
        print("# not a tpu backend: measured table NOT written",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
