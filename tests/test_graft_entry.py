"""Protect the driver-facing entry points (__graft_entry__)."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    zd, wz, ll = out
    assert np.isfinite(float(ll))
    assert np.asarray(zd).shape[0] == args[0].shape[0]


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_live_backend_probe_timeout_semantics(monkeypatch):
    """The poisoned-backend guard: a hanging device op must return False
    within the timeout (a dead relay's ops block forever in C — the probe
    thread is abandoned, not joined); a healthy op returns True."""
    import time

    import jax

    import __graft_entry__ as g

    assert g._live_backend_responsive(5.0) is True  # healthy CPU backend

    real_put = jax.device_put

    def hanging_put(*a, **k):
        time.sleep(30)
        return real_put(*a, **k)

    monkeypatch.setattr(jax, "device_put", hanging_put)
    t0 = time.time()
    assert g._live_backend_responsive(0.5) is False
    assert time.time() - t0 < 5  # returned at the timeout, not after 30s


def test_dryrun_multichip_6():
    """Non-power-of-two device count (VERDICT r04 item 7): a 6-device dryrun
    exercises the 3x2 mesh and 3-run runs-mesh shard-divisibility edges."""
    import __graft_entry__ as g

    g.dryrun_multichip(6)
