"""Shared example plumbing: fall back to CPU when the accelerator is absent
or its transport is unresponsive (a hung device op blocks forever; probing in
a killable subprocess is the only safe check — same pattern as bench.py)."""

import os
import subprocess
import sys


def _probe_code():
    """The ONE probe definition lives in bench.py (_PROBE_CODE) — import it so
    example gating can never drift from bench's own gating semantics."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench._PROBE_CODE


def ensure_responsive_backend(probe_timeout_s=120):
    """If the default jax backend is a (possibly dead) accelerator, probe it;
    switch this process to CPU when the probe fails.  Returns the backend name
    that will actually be used."""
    import jax

    try:
        platform = jax.config.jax_platforms
    except AttributeError:
        platform = None
    if platform == "cpu":
        return "cpu"
    try:
        ok = subprocess.run(
            [sys.executable, "-c", _probe_code()], timeout=probe_timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode == 0
    except Exception:
        ok = False
    if not ok:
        print("# accelerator backend unresponsive; running on CPU",
              file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return jax.default_backend()
