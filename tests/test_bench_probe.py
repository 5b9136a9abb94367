"""bench.py relay-probe logic: retry/backoff and fallback self-description.

bench.py is the driver's official perf artifact; round 2 recorded a CPU
fallback that looked like a 100x regression because a single dead probe
permanently re-execed to CPU.  These tests pin the hardened behavior without
touching a device: the per-attempt prober is stubbed.
"""

import importlib.util
import sys
import time
from pathlib import Path

import pytest


@pytest.fixture()
def bench(monkeypatch):
    path = Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_probe_succeeds_on_recovery(bench, monkeypatch):
    """A relay that recovers mid-budget is detected (the round-2 failure mode:
    one failed probe forfeited the whole TPU measurement)."""
    calls = []

    def fake_once(timeout_s):
        calls.append(timeout_s)
        return len(calls) >= 3  # dead, dead, then alive

    monkeypatch.setattr(bench, "_device_responsive_once", fake_once)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    assert bench._device_responsive(budget_s=10_000) is True
    assert len(calls) == 3


def test_probe_gives_up_within_budget(bench, monkeypatch):
    monkeypatch.setattr(bench, "_device_responsive_once", lambda t: False)
    sleeps = []
    monkeypatch.setattr(time, "sleep", lambda s: sleeps.append(s))

    fake_now = [0.0]

    def fake_time():
        fake_now[0] += 60.0  # every probe/backoff consumes a minute
        return fake_now[0]

    monkeypatch.setattr(time, "time", fake_time)
    assert bench._device_responsive(budget_s=300) is False


def test_probe_budget_env_override(bench, monkeypatch):
    monkeypatch.setenv("ENSTOP_BENCH_PROBE_BUDGET_S", "1")
    monkeypatch.setattr(bench, "_device_responsive_once", lambda t: False)
    t0 = time.time()
    assert bench._device_responsive() is False
    assert time.time() - t0 < 5  # tiny budget respected (no 20-min default)


def test_probe_subprocess_code_is_pure_transfer(bench):
    """The liveness probe must not trigger a compile (a healthy relay with a
    slow remote compiler must still count as alive)."""
    assert "device_put" in bench._PROBE_CODE
    for banned in ("jit", "while_loop", "@", "dot", "matmul"):
        assert banned not in bench._PROBE_CODE


def test_bench_never_exits_nonzero_on_failure():
    """The round-3 artifact was rc=1 (a crash, no number).  Drive the retry
    ladder end-to-end in a real subprocess: a body that always raises must
    walk cache-on -> cache-off -> (already CPU) -> honest error JSON, and
    the process MUST exit 0."""
    import json
    import os
    import subprocess
    import sys

    env = dict(
        os.environ,
        ENSTOP_BENCH_FORCE_CPU="1",
        ENSTOP_BENCH_SELFTEST_RAISE="1",
        ENSTOP_AOT_CACHE="1",
    )
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "bench.py")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    record = json.loads(r.stdout.strip().splitlines()[-1])
    assert record["backend"] == "error"
    assert "selftest: simulated bench failure" in record["error"]
    assert record["value"] == 0.0
    # the ladder actually walked: the cache-off re-exec is in stderr
    assert "retrying with it off" in r.stderr
