"""Profiling and tracing hooks (greenfield — the reference has none, SURVEY §5).

* :func:`trace` — context manager around the JAX profiler; the captured trace
  (XLA ops, Pallas kernels, HBM traffic) opens in TensorBoard/Perfetto.
* :func:`fit_stats` — summarize a fitted estimator's ``fit_info_``.
* :class:`StepTimer` — lightweight wall-clock section timing with device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "fit_stats", "StepTimer"]


@contextlib.contextmanager
def trace(logdir):
    """Capture a device profile for everything inside the block.

    >>> with trace("/tmp/enstop-profile"):
    ...     PLSA(n_components=20).fit(X)
    """
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fit_stats(model):
    """Human-readable throughput summary from a fitted model's ``fit_info_``."""
    info = getattr(model, "fit_info_", None)
    if not info:
        return "no fit info recorded (model not fitted via the instrumented path)"
    return (
        "{steps} EM steps in {wall:.3f}s device-side "
        "({rate:.2f}G nnz*k updates/s); final log-likelihood {ll:.1f}".format(
            steps=info["n_steps"],
            wall=info["wall_time_s"],
            rate=info["nnz_k_updates_per_s"] / 1e9,
            ll=info["log_likelihood"],
        )
    )


class StepTimer:
    """Wall-clock section timer that blocks on device completion.

    >>> t = StepTimer()
    >>> with t.section("em"):
    ...     state = step(state)
    >>> t.report()
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        return {
            name: {"total_s": total, "calls": self.counts[name],
                   "mean_ms": 1e3 * total / self.counts[name]}
            for name, total in sorted(self.totals.items())
        }
