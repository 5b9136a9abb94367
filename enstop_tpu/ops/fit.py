"""On-device EM fit loops with the reference's convergence schedule.

The reference runs its EM loop host-side (or in one njit body) and tests relative
log-likelihood improvement at iterations ``i % n_iter_per_test == 0``, i.e. after
steps 1, 1+npt, 1+2npt, ... (plsa.py:516-640).  Here the entire loop — including the
convergence test — is a single compiled ``lax.while_loop`` so no host round-trips
happen between iterations (unlike the reference GPU path, which downloads factors to
the host for every test, cuda_plsa.py:271-315).

The loop is generic over the step/likelihood implementations so the XLA-matmul,
fused-Pallas, and mesh-sharded backends all share it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def em_fit_loop(em_step, ll_fn, state0, n_iter, n_iter_per_test, tolerance):
    """Run EM with the reference's exact convergence schedule.

    Parameters
    ----------
    em_step : callable ``state -> (state, ll_of_inputs)``
    ll_fn : callable ``state -> scalar`` log-likelihood of the current state
    state0 : pytree of factors (and any backend-specific carry)
    n_iter, n_iter_per_test : ints — may be *traced* scalars, so one compiled
        program serves every iteration-count configuration (compilation of the
        full loop program is expensive; nothing here needs the values statically)
    tolerance : float; relative-improvement threshold (reference plsa.py:630-638:
        stop when ``|cur - prev| == 0`` or ``|cur - prev| / |cur| < tolerance``)

    Returns
    -------
    (state, n_steps_done, final_ll)
    """
    n_iter = jnp.asarray(n_iter, jnp.int32)
    n_iter_per_test = jnp.maximum(jnp.asarray(n_iter_per_test, jnp.int32), 1)
    tolerance = jnp.float32(tolerance)

    prev_ll = ll_fn(state0)

    def cond(carry):
        _, done, converged, _ = carry
        return jnp.logical_and(done < n_iter, jnp.logical_not(converged))

    def body(carry):
        state, done, _, prev = carry
        # Next stopping point: step 1 for the first chunk, then every npt steps;
        # capped at n_iter (a final partial chunk runs without a test).
        test_point = jnp.where(done == 0, 1, done + n_iter_per_test)
        next_stop = jnp.minimum(n_iter, test_point)
        is_test = next_stop == test_point

        def stepper(_, s):
            s, _ll = em_step(s)
            return s

        state = lax.fori_loop(0, next_stop - done, stepper, state)

        cur = ll_fn(state)
        change = jnp.abs(cur - prev)
        converged = jnp.logical_and(
            is_test,
            jnp.logical_or(change == 0.0, change / jnp.abs(cur) < tolerance),
        )
        prev = jnp.where(is_test, cur, prev)
        return (state, next_stop, converged, prev)

    state, done, _, prev = lax.while_loop(
        cond, body, (state0, jnp.int32(0), jnp.asarray(False), prev_ll)
    )
    return state, done, prev


def em_fit_loop_traced(em_step, ll_fn, state0, n_iter, n_iter_per_test, tolerance):
    """Like :func:`em_fit_loop` but also records the per-test log-likelihood
    trajectory (for observability / parity tests).  Returns
    ``(state, n_steps, lls, n_tests)`` where ``lls`` has static length
    ``1 + ceil(n_iter / n_iter_per_test)`` (unused tail entries are NaN)."""
    n_iter = int(n_iter)
    npt = max(1, int(n_iter_per_test))
    tolerance = jnp.float32(tolerance)
    max_tests = 1 + (n_iter + npt - 1) // npt

    prev_ll = ll_fn(state0)
    lls0 = jnp.full((max_tests,), jnp.nan, dtype=jnp.float32).at[0].set(prev_ll)

    def cond(carry):
        _, done, converged, _, _, _ = carry
        return jnp.logical_and(done < n_iter, jnp.logical_not(converged))

    def body(carry):
        state, done, _, prev, lls, t = carry
        test_point = jnp.where(done == 0, 1, done + npt)
        next_stop = jnp.minimum(n_iter, test_point)
        is_test = next_stop == test_point

        def stepper(_, s):
            s, _ll = em_step(s)
            return s

        state = lax.fori_loop(0, next_stop - done, stepper, state)
        cur = ll_fn(state)
        change = jnp.abs(cur - prev)
        converged = jnp.logical_and(
            is_test,
            jnp.logical_or(change == 0.0, change / jnp.abs(cur) < tolerance),
        )
        lls = jnp.where(is_test, lls.at[t].set(cur), lls)
        t = jnp.where(is_test, t + 1, t)
        prev = jnp.where(is_test, cur, prev)
        return (state, next_stop, converged, prev, lls, t)

    state, done, _, _, lls, t = lax.while_loop(
        cond, body, (state0, jnp.int32(0), jnp.asarray(False), prev_ll, lls0, jnp.int32(1))
    )
    return state, done, lls, t
