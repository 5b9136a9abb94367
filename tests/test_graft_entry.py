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
