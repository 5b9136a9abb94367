"""On-device EM fit loops with the reference's convergence schedule.

The reference runs its EM loop host-side (or in one njit body) and tests relative
log-likelihood improvement at iterations ``i % n_iter_per_test == 0``, i.e. after
steps 1, 1+npt, 1+2npt, ... (plsa.py:516-640).  Here the entire loop — including the
convergence test — is a single compiled ``lax.while_loop`` so no host round-trips
happen between iterations (unlike the reference GPU path, which downloads factors to
the host for every test, cuda_plsa.py:271-315).

The loop is generic over the step/likelihood implementations so the XLA-matmul,
fused-Pallas, and mesh-sharded backends all share it.  It also records the
log-likelihood trajectory at every test point into a fixed-size on-device buffer —
the reference computes these values but discards them (plsa.py:630-638); here they
come back for free as ``FitResult.ll_trace`` (observability greenfield, SURVEY §5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Fixed-size trajectory buffer: static so one compiled program serves every
# n_iter / n_iter_per_test combination.  128 test points cover n_iter up to
# 127 * n_iter_per_test; later entries just stop being recorded.
MAX_LL_TRACE = 128


class FitResult(NamedTuple):
    state: tuple
    n_steps: jnp.ndarray          # int32 — EM steps executed
    final_ll: jnp.ndarray         # f32 — last tested log-likelihood
    ll_trace: jnp.ndarray         # (MAX_LL_TRACE,) f32, NaN-padded
    n_tests: jnp.ndarray          # int32 — valid entries in ll_trace


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
    :class:`FitResult`
    """
    n_iter = jnp.asarray(n_iter, jnp.int32)
    n_iter_per_test = jnp.maximum(jnp.asarray(n_iter_per_test, jnp.int32), 1)
    tolerance = jnp.float32(tolerance)

    prev_ll = ll_fn(state0)
    trace0 = (
        jnp.full((MAX_LL_TRACE,), jnp.nan, dtype=jnp.float32).at[0].set(prev_ll)
    )

    def cond(carry):
        _, done, converged, _, _, _ = carry
        return jnp.logical_and(done < n_iter, jnp.logical_not(converged))

    def body(carry):
        state, done, _, prev, trace, t = carry
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
        record = jnp.logical_and(is_test, t < MAX_LL_TRACE)
        trace = jnp.where(record, trace.at[jnp.minimum(t, MAX_LL_TRACE - 1)].set(cur), trace)
        t = jnp.where(record, t + 1, t)
        prev = jnp.where(is_test, cur, prev)
        return (state, next_stop, converged, prev, trace, t)

    state, done, _, prev, trace, t = lax.while_loop(
        cond,
        body,
        (state0, jnp.int32(0), jnp.asarray(False), prev_ll, trace0, jnp.int32(1)),
    )
    return FitResult(state, done, prev, trace, t)


def em_fit_loop_traced(em_step, ll_fn, state0, n_iter, n_iter_per_test, tolerance):
    """Back-compat shim: returns ``(state, n_steps, lls, n_tests)``."""
    res = em_fit_loop(em_step, ll_fn, state0, n_iter, n_iter_per_test, tolerance)
    return res.state, res.n_steps, res.ll_trace, res.n_tests


def em_fit_loop_folded(em_step_ll, em_step, ll_fn, state0, n_iter,
                       n_iter_per_test, tolerance):
    """:func:`em_fit_loop` with the convergence log-likelihood FOLDED into the
    EM step: every EM pass computes S = P(z|d)P(w|z) anyway, so the step kernel
    can return LL(input state) for free (``em_step_ll``), and the test value
    LL(state_T) is produced by running step T+1 with the fold on — no separate
    LL sweep over the data (measured ~3% of fit time at 20NG scale).

    Exact trajectory parity with :func:`em_fit_loop`: identical test schedule,
    identical tested values, and on early convergence the returned state is
    state_T (the fold's T+1-th step is discarded), with ``n_steps = T``.  The
    standalone ``ll_fn`` is used only when a test point lands exactly on
    ``n_iter`` (no T+1 step may run) — at most one sweep per fit.

    Parameters: ``em_step_ll(state) -> (state', ll_of_input)``,
    ``em_step(state) -> (state', ignored)``, ``ll_fn(state) -> scalar``.
    """
    n_iter = jnp.asarray(n_iter, jnp.int32)
    npt = jnp.maximum(jnp.asarray(n_iter_per_test, jnp.int32), 1)
    tolerance = jnp.float32(tolerance)

    # first step carries LL(state0) out for free
    state1, ll0 = em_step_ll(state0)
    trace0 = jnp.full((MAX_LL_TRACE,), jnp.nan, jnp.float32).at[0].set(ll0)

    def cond(carry):
        state, saved, done, steps_rep, next_tp, prev, trace, t, converged = carry
        return jnp.logical_and(
            jnp.logical_not(converged),
            jnp.logical_or(done < n_iter, next_tp <= n_iter),
        )

    def body(carry):
        state, saved, done, steps_rep, next_tp, prev, trace, t, converged = carry

        def to_test(_):
            T = next_tp

            def plain(_, s):
                s2, _ll = em_step(s)
                return s2

            state_T = lax.fori_loop(0, T - done, plain, state)

            def fold(sT):
                s_next, llT = em_step_ll(sT)
                return s_next, llT, T + 1

            def sweep(sT):
                return sT, ll_fn(sT), T

            s_after, llT, new_done = lax.cond(T < n_iter, fold, sweep, state_T)

            change = jnp.abs(llT - prev)
            conv = jnp.logical_or(change == 0.0, change / jnp.abs(llT) < tolerance)
            record = t < MAX_LL_TRACE
            new_trace = jnp.where(
                record, trace.at[jnp.minimum(t, MAX_LL_TRACE - 1)].set(llT), trace
            )
            new_t = jnp.where(record, t + 1, t)
            # on convergence the reference stops AT the test point
            return (s_after, state_T, new_done, jnp.where(conv, T, new_done),
                    T + npt, llT, new_trace, new_t, conv)

        def to_cap(_):
            def plain(_, s):
                s2, _ll = em_step(s)
                return s2

            s_end = lax.fori_loop(0, n_iter - done, plain, state)
            return (s_end, saved, n_iter, n_iter, next_tp, prev, trace, t,
                    converged)

        return lax.cond(next_tp <= n_iter, to_test, to_cap, None)

    init = (state1, state0, jnp.int32(1), jnp.int32(1), jnp.int32(1), ll0,
            trace0, jnp.int32(1), jnp.asarray(False))
    state, saved, done, steps_rep, next_tp, prev, trace, t, converged = (
        lax.while_loop(cond, body, init)
    )
    final_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(converged, a, b), saved, state
    )
    # n_iter == 0: the unconditional first fold-step must not surface
    final_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(n_iter == 0, a, b), state0, final_state
    )
    steps_rep = jnp.minimum(steps_rep, n_iter)
    return FitResult(final_state, steps_rep, prev, trace, t)
