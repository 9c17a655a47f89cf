"""Device-resident PFASST block execution (the production fast lane).

The stage-machine controllers interleave Python dispatch with device work:
every sweep pays a host round-trip for residual bookkeeping, which made the
8-device sharded run 25x slower than serial SDC in round 2.  This module
compiles one ENTIRE block solve — SPREAD, the predictor, and the complete
iterate-until-converged PFASST loop with Gauss-Seidel convergence
forwarding — into a single XLA program built around ``lax.while_loop``.  A
block of P time steps runs to convergence with ZERO host syncs; the host
fetches (uend, niter, residual history) once per block and synthesizes the
default stats entries from them.

Two lanes live here:

- :func:`run_fused` — restol/maxiter-terminated runs.  The whole marching
  loop over full blocks is ONE ``lax.scan`` program; termination is decided
  on device by a ``lax.while_loop``.
- :func:`run_fused_adaptive` — the adaptive production stack (embedded-error
  ``Adaptivity`` with the standard OR linearized estimator flavor,
  embedded-RK ``AdaptivityRK``, restarts, step-size limiting — matching the
  reference's ``adaptivity.py:80-97,422`` + ``basic_restarting.py:134``).
  Adaptivity pins a *fixed* iteration count (restol disabled), so each
  block is a fixed-depth ``fori_loop`` that additionally tracks the
  embedded error history on device.  dt stays a traced scalar (SURVEY §7 hard-part (e)) — step-size
  changes never retrace.  The host fetches (residual history, embedded-error
  history) ONCE per block and then replays the genuine convergence-policy
  and hook sequence (``_route_after_check``) on the shadow steps, so
  restarts, limiter clamping, donor selection and the stats dictionary match
  the stage machine entry for entry (gated in tests/test_fused.py).

Semantics are pinned to the stage machine (``parallel/nonmpi.py``): the
per-iteration order is IT_CHECK (boundary exchange, residual, convergence
flags with prev_done forwarding) -> IT_DOWN (restrict cascade with
intermediate sweeps) -> IT_COARSE (serialized Gauss-Seidel chain) -> IT_UP
(prolong cascade) -> IT_FINE (nsweeps fine sweeps with exchanges).
``tests/test_fused.py`` gates uend and per-step iteration counts against
the slow sharded and virtual controllers — the invariant the reference
pins between its two controllers (tests/test_tutorials/test_step_6.py:26-42,
controller_MPI.py:403-460 vs controller_nonMPI.py:297-330).

Eligibility is checked (ineligible raises ControllerError so callers fall
back to the stage-machine path), including the registered hooks: only hooks
whose entries the fused lanes actually produce are allowed — any other hook
(LogWork, user hooks, ...) forces the stage machine, rather than silently
returning empty stats.  Per-sweep residual/timing entries are not recorded
on either lane — the device loop does not compute them (they are
diagnostics, not part of the algorithm).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.convergence.basic_restarting import BasicRestarting
from pysdc_tpu.convergence.check_convergence import CheckConvergence
from pysdc_tpu.convergence.spread_step_sizes import SpreadStepSizesBlockwise
from pysdc_tpu.core.errors import ControllerError


class _Carry(NamedTuple):
    states: tuple  # LevelState per level, leading (P,) axis
    uends: tuple  # (P, *shape_l) per level
    done: jnp.ndarray  # (P,) bool
    iters: jnp.ndarray  # (P,) int32
    res_hist: jnp.ndarray  # (maxiter+2, P) residuals at each IT_CHECK
    k: jnp.ndarray  # scalar int32: IT_CHECK counter
    cont: jnp.ndarray  # scalar bool: keep iterating


def _plain_hook_allowlist():
    from pysdc_tpu.core.hooks import CPUTimings, DefaultHooks
    from pysdc_tpu.hooks.logging_hooks import LogRestarts

    return (DefaultHooks, CPUTimings, LogRestarts)


def _adaptive_hook_allowlist():
    from pysdc_tpu.hooks.logging_hooks import (
        LogEmbeddedErrorEstimate,
        LogSolution,
        LogStepSize,
    )

    return _plain_hook_allowlist() + (LogEmbeddedErrorEstimate, LogStepSize, LogSolution)


def _check_hooks(ctrl, allowed, lane):
    for hook in ctrl.hooks:
        if not isinstance(hook, allowed):
            raise ControllerError(
                f'hook {type(hook).__name__} needs per-sweep data the {lane} lane does not '
                f'record; this configuration runs on the stage-machine path'
            )


def _shared_eligibility(ctrl):
    """Constraints common to both fused lanes."""
    lvl0 = ctrl.MS[0].levels[0]
    if ctrl.params.use_iteration_estimator:
        raise ControllerError('fused block execution does not support the iteration estimator')
    for lvl in ctrl.MS[0].levels:
        if lvl.sweep.k_dependent:
            raise ControllerError(
                'fused block execution needs iteration-independent preconditioners '
                '(k-dependent QI/QE change coefficients per sweep)'
            )
    if ctrl.params.predict_type not in (None, 'fine_only', 'pfasst_burnin', 'fmg'):
        raise ControllerError(f'unknown predict_type {ctrl.params.predict_type!r}')


def check_fused_eligibility(ctrl):
    """Raise ControllerError when the configuration needs another path."""
    # the default stack: CheckConvergence + BasicRestarting and its
    # SpreadStepSizesBlockwise dependency (a no-op at fixed dt)
    allowed = (CheckConvergence, BasicRestarting, SpreadStepSizesBlockwise)
    for C in ctrl.convergence_controllers:
        if type(C) not in allowed:
            raise ControllerError(
                f'fused block execution supports only restol/maxiter termination; '
                f'{type(C).__name__} needs the adaptive fused lane or the stage-machine path'
            )
    lvl0 = ctrl.MS[0].levels[0]
    e_tol = getattr(lvl0.params, 'e_tol', None)
    if e_tol is not None and e_tol > 0:
        raise ControllerError('fused block execution does not support e_tol termination')
    for lvl in ctrl.MS[0].levels:
        if float(lvl.params.dt) != float(lvl0.params.dt):
            raise ControllerError('fused block execution needs one dt across levels')
    _shared_eligibility(ctrl)
    _check_hooks(ctrl, _plain_hook_allowlist(), 'fused')


def check_fused_adaptive_eligibility(ctrl):
    """Eligibility of the device-resident adaptive lane.

    Supported: the embedded-error production stack — ``Adaptivity``
    (standard flavor) + ``EstimateEmbeddedError`` + ``StoreUOld`` +
    ``BasicRestarting``/``SpreadStepSizesBlockwise`` + the step-size
    limiter/rounding family — under maxiter-only termination (``Adaptivity``
    itself enforces restol < 0).  Everything else (RK-embedded adaptivity,
    linearized estimators, HotRod, ...) raises and runs the stage machine.
    """
    from pysdc_tpu.convergence.adaptivity import Adaptivity, AdaptivityRK
    from pysdc_tpu.convergence.estimate_embedded_error import (
        EstimateEmbeddedError,
        EstimateEmbeddedErrorLinearized,
    )
    from pysdc_tpu.convergence.step_size_limiter import (
        StepSizeLimiter,
        StepSizeRounding,
        StepSizeSlopeLimiter,
    )
    from pysdc_tpu.convergence.store_uold import StoreUOld

    allowed = (
        CheckConvergence,
        BasicRestarting,
        SpreadStepSizesBlockwise,
        Adaptivity,
        AdaptivityRK,  # embedded pairs: the estimator reads the synced
        # shadow state's secondary end point at the final check
        EstimateEmbeddedError,
        EstimateEmbeddedErrorLinearized,
        StoreUOld,
        StepSizeLimiter,
        StepSizeSlopeLimiter,
        StepSizeRounding,
    )
    for C in ctrl.convergence_controllers:
        # exact-type matching: subclasses (AdaptivityRK, linearized
        # estimators, ...) carry different semantics the device program
        # does not implement
        if type(C) not in allowed:
            raise ControllerError(
                f'{type(C).__name__} is not supported by the adaptive fused lane; '
                f'this configuration runs on the stage-machine path'
            )
    lvl0 = ctrl.MS[0].levels[0]
    if float(lvl0.params.restol) >= 0:
        raise ControllerError(
            'the adaptive fused lane runs a fixed-depth device loop and needs '
            'maxiter-only termination (restol < 0)'
        )
    e_tol = getattr(lvl0.params, 'e_tol', None)
    if e_tol is not None and e_tol > 0:
        raise ControllerError('the adaptive fused lane does not support e_tol termination')
    _shared_eligibility(ctrl)
    _check_hooks(ctrl, _adaptive_hook_allowlist(), 'adaptive fused')


def _build_parts(ctrl):
    """Shared building blocks of the whole-block device programs."""
    blocks = ctrl.blocks
    transfers = ctrl.transfers
    nlevels = ctrl.nlevels
    nsweeps = ctrl.nsweeps
    P = ctrl.num_procs
    predict_type = ctrl.params.predict_type
    mssdc_jac = bool(ctrl.params.mssdc_jac)
    coarse_raw = {
        'owner': blocks[-1].raw.coarse_owner,
        'pipelined': blocks[-1].raw.coarse_pipelined,
        'replicated': blocks[-1].raw.coarse_replicated,
        'diag': blocks[-1].raw.coarse_diag,
    }[ctrl.coarse_mode]
    arange = jnp.arange(P)

    def shifted(done):
        """prev_done per slot: done flag of the predecessor (False at slot 0)."""
        return jnp.concatenate([jnp.zeros((1,), bool), done[:-1]])

    def exchange(lvl, state, uend, t_arr, dts, active, prev_done):
        raw = blocks[lvl].raw
        uend = raw.endpoint(state, t_arr, dts[lvl], active, uend)
        recv = active & (arange > 0) & ~prev_done
        state = raw.shift_recv(state, uend, t_arr, recv)
        return state, uend

    def sweep_rounds(lvl, state, uend, t_arr, dts, active, prev_done, n):
        """n x (exchange + masked sweep) — the _masked_sweeps loop body."""
        raw = blocks[lvl].raw
        for _ in range(n):
            state, uend = exchange(lvl, state, uend, t_arr, dts, active, prev_done)
            state = raw.sweep(state, t_arr, dts[lvl], active, 0)
        return state, uend

    def restrict_all(states, t_arr, dts):
        """Restrict fine -> coarsest through every level; keep uolds."""
        states = list(states)
        uolds = [None] * nlevels
        for l, tr in enumerate(transfers):
            Gs, Guold, _ = tr.restrict_raw(states[l], t_arr, dts[l + 1], dts[l])
            states[l + 1] = Gs
            uolds[l + 1] = Guold
        return states, uolds

    # -- predictors ------------------------------------------------------
    def predict_burnin(states, uends, t_arr, dts, window):
        """Staggered coarse wavefront (nonmpi.py _burnin, batched via masks);
        the wavefront kernel is the diag-basis one when select_coarse_impl
        resolved 'diag' (the whole serial burn-in runs as elementwise hat-
        space sweeps between one batched transform pair)."""
        states, uolds = restrict_all(states, t_arr, dts)
        craw = blocks[-1].raw
        n_active = jnp.sum(window.astype(jnp.int32))
        cst, cuend = craw.wavefront_active(
            states[-1], uends[-1], t_arr, dts[-1], window, n_active
        )
        states[-1] = cst
        uends = list(uends)
        uends[-1] = cuend

        for l in range(nlevels - 1, 0, -1):
            states[l - 1] = transfers[l - 1].prolong_raw(
                states[l - 1], states[l], uolds[l], t_arr, dts[l - 1]
            )
        states[0], uends[0] = exchange(
            0, states[0], uends[0], t_arr, dts, window, jnp.zeros((P,), bool)
        )
        states[0] = blocks[0].raw.sweep(states[0], t_arr, dts[0], window, 0)
        return states, uends

    def predict_fmg(states, uends, t_arr, dts, window):
        """FMG predictor (nonmpi.py _full_multigrid, batched)."""
        states, uolds = restrict_all(states, t_arr, dts)
        uends = list(uends)
        no_prev = jnp.zeros((P,), bool)
        recv = window & (arange > 0)
        states[-1], uends[-1] = coarse_raw(
            states[-1], uends[-1], t_arr, dts[-1], recv, window, 0
        )
        for l in range(nlevels - 1, 0, -1):
            states[l - 1] = transfers[l - 1].prolong_raw(
                states[l - 1], states[l], uolds[l], t_arr, dts[l - 1]
            )
            if l - 1 > 0:
                states[l - 1] = blocks[l - 1].raw.sweep(states[l - 1], t_arr, dts[l - 1], window, 0)
        states[0], uends[0] = exchange(0, states[0], uends[0], t_arr, dts, window, no_prev)
        states[0] = blocks[0].raw.sweep(states[0], t_arr, dts[0], window, 0)
        return states, uends

    # -- one PFASST iteration of work (post IT_CHECK) --------------------
    def iteration_work(states, uends, t_arr, dts, active, prev_done):
        states = list(states)
        uends = list(uends)
        if nlevels == 1:
            if P == 1 or mssdc_jac:
                states[0], uends[0] = sweep_rounds(
                    0, states[0], uends[0], t_arr, dts, active, prev_done, nsweeps[0]
                )
            else:  # Gauss-Seidel MSSDC: serialized single-level chain
                recv = active & (arange > 0) & ~prev_done
                states[0], uends[0] = coarse_raw(
                    states[0], uends[0], t_arr, dts[0], recv, active, 0
                )
            return tuple(states), tuple(uends)

        # IT_DOWN: intermediate-level sweeps + restriction cascade
        uolds = [None] * nlevels
        for l, tr in enumerate(transfers):
            if l > 0:
                states[l], uends[l] = sweep_rounds(
                    l, states[l], uends[l], t_arr, dts, active, prev_done, nsweeps[l]
                )
            Gs, Guold, _ = tr.restrict_raw(states[l], t_arr, dts[l + 1], dts[l])
            states[l + 1] = Gs
            uolds[l + 1] = Guold

        # IT_COARSE: serialized Gauss-Seidel chain over the time axis
        recv = active & (arange > 0) & ~prev_done
        states[-1], uends[-1] = coarse_raw(
            states[-1], uends[-1], t_arr, dts[-1], recv, active, 0
        )

        # IT_UP: prolongation cascade (+ intermediate sweeps)
        for l in range(nlevels - 1, 0, -1):
            states[l - 1] = transfers[l - 1].prolong_raw(
                states[l - 1], states[l], uolds[l], t_arr, dts[l - 1]
            )
            if l - 1 > 0:
                states[l - 1], uends[l - 1] = sweep_rounds(
                    l - 1, states[l - 1], uends[l - 1], t_arr, dts, active, prev_done,
                    nsweeps[l - 1],
                )

        # IT_FINE
        states[0], uends[0] = sweep_rounds(
            0, states[0], uends[0], t_arr, dts, active, prev_done, nsweeps[0]
        )
        return tuple(states), tuple(uends)

    def spread(u0, t_arr, dts):
        """SPREAD + coarse-carry materialization."""
        u0_block = jnp.broadcast_to(u0, (P,) + u0.shape)
        fine = blocks[0].raw.predict(u0_block, t_arr, dts[0])
        if ctrl.mesh is not None:
            fine = jax.lax.with_sharding_constraint(
                fine, jax.tree_util.tree_map(blocks[0]._time_spec, fine)
            )
        states = [fine]
        uends = [jnp.zeros((P,) + blocks[0].level.prob.shape, blocks[0].level.prob.dtype)]
        # materialize coarse-level carries (overwritten by every restriction)
        for l in range(1, nlevels):
            Gs, _, _ = transfers[l - 1].restrict_raw(states[l - 1], t_arr, dts[l], dts[l - 1])
            states.append(Gs)
            uends.append(
                jnp.zeros((P,) + blocks[l].level.prob.shape, blocks[l].level.prob.dtype)
            )
        return states, uends

    def predict(states, uends, t_arr, dts, window):
        if predict_type == 'pfasst_burnin' and nlevels > 1:
            states, uends = predict_burnin(states, uends, t_arr, dts, window)
        elif predict_type == 'fmg' and nlevels > 1:
            states, uends = predict_fmg(states, uends, t_arr, dts, window)
        elif predict_type == 'fine_only':
            states = list(states)
            states[0], uends[0] = sweep_rounds(
                0, states[0], uends[0], t_arr, dts, window, jnp.zeros((P,), bool), 1
            )
        return states, uends

    return SimpleNamespace(
        P=P,
        arange=arange,
        shifted=shifted,
        exchange=exchange,
        sweep_rounds=sweep_rounds,
        iteration_work=iteration_work,
        spread=spread,
        predict=predict,
    )


def build_fused_block(ctrl):
    """Compile the whole-block PFASST solve for a ShardedController.

    Returns ``fused(u0, t_arr, dt, window) -> (uend_block, iters, res_hist,
    n_checks)`` where ``window`` is the (P,) prefix mask of active slots.
    """
    parts = _build_parts(ctrl)
    blocks = ctrl.blocks
    P = ctrl.num_procs
    template = ctrl.MS[0]
    restol = float(template.levels[0].params.restol)
    maxiter = int(template.params.maxiter)
    all_to_done = bool(ctrl.params.all_to_done)
    arange = parts.arange

    nlevels = ctrl.nlevels

    # -- the fused whole-block program -----------------------------------
    def fused(u0, t_arr, dt, window):
        dts = jnp.stack([dt] * nlevels)  # plain lane: one dt on every level
        states, uends = parts.spread(u0, t_arr, dts)
        states, uends = parts.predict(states, uends, t_arr, dts, window)

        carry0 = _Carry(
            states=tuple(states),
            uends=tuple(uends),
            done=~window,
            iters=jnp.zeros((P,), jnp.int32),
            res_hist=jnp.zeros((maxiter + 2, P), jnp.float64 if states[0].u.dtype == jnp.float64 else jnp.float32),
            k=jnp.zeros((), jnp.int32),
            cont=jnp.ones((), bool),
        )

        def cond(c):
            return c.cont

        def body(c):
            # IT_CHECK: exchange + residual + convergence flags
            active = window & ~c.done
            prev_done = parts.shifted(c.done)
            states = list(c.states)
            uends = list(c.uends)
            states[0], uends[0] = parts.exchange(
                0, states[0], uends[0], t_arr, dts, active, prev_done
            )
            res = blocks[0].raw.residual(states[0], dt)
            res_hist = c.res_hist.at[c.k].set(jnp.where(active, res, c.res_hist[c.k]))

            raw_done = (res <= restol) | (c.iters >= maxiter)
            done = c.done | (active & raw_done) | ~window
            # Gauss-Seidel forwarding: done[j] requires done[j-1] (prefix AND)
            done = jnp.cumprod(done.astype(jnp.int32)).astype(bool) | ~window
            if all_to_done:
                done = jnp.where(window, jnp.all(done), True)
            iters = jnp.where(window & ~done, c.iters + 1, c.iters)
            cont = ~jnp.all(done)

            active2 = window & ~done
            prev_done2 = parts.shifted(done)

            def work(operand):
                states, uends = operand
                return parts.iteration_work(states, uends, t_arr, dts, active2, prev_done2)

            states, uends = jax.lax.cond(
                cont, work, lambda op: op, (tuple(states), tuple(uends))
            )
            return _Carry(states, uends, done, iters, res_hist, c.k + 1, cont)

        out = jax.lax.while_loop(cond, body, carry0)
        return out.uends[0], out.iters, out.res_hist, out.k

    return fused


def build_fused_adaptive_block(ctrl):
    """Fixed-depth whole-block program for the adaptive stack.

    With restol disabled (Adaptivity's contract) every step runs exactly
    ``maxiter`` iterations, so the block is a ``fori_loop`` — no
    convergence flags, no early exit.  Besides the residual history the
    program tracks the embedded error estimate on device: at IT_CHECK k the
    sweep-to-sweep difference at the last collocation node
    ``|u^k[-1] - u^{k-1}[-1]|`` (the reference's ``EstimateEmbeddedError``
    from ``StoreUOld`` snapshots, estimate_embedded_error.py:9-150).

    Returns ``fused_adaptive(u0, t_arr, dt, window) -> (fine_state,
    uend_block, res_hist, e_hist)`` with histories shaped (maxiter+1, P).
    """
    parts = _build_parts(ctrl)
    blocks = ctrl.blocks
    P = ctrl.num_procs
    maxiter = int(ctrl.MS[0].params.maxiter)
    rel_error = False
    from pysdc_tpu.convergence.estimate_embedded_error import EstimateEmbeddedError

    for C in ctrl.convergence_controllers:
        if isinstance(C, EstimateEmbeddedError):
            rel_error = bool(C.params.rel_error)

    def last_node(u):
        return jax.tree_util.tree_map(lambda a: a[:, -1], u)

    def step_norm(tree):
        """Per-step max-abs over everything but the leading (P,) axis."""
        leaves = [
            jnp.max(jnp.abs(leaf).reshape(leaf.shape[0], -1), axis=1)
            for leaf in jax.tree_util.tree_leaves(tree)
        ]
        return jnp.max(jnp.stack(leaves), axis=0)

    def fused_adaptive(u0, t_arr, dts, window):
        states, uends = parts.spread(u0, t_arr, dts)
        states, uends = parts.predict(states, uends, t_arr, dts, window)
        rdtype = jnp.float64 if states[0].u.dtype == jnp.float64 else jnp.float32
        res_hist0 = jnp.zeros((maxiter + 1, P), rdtype)
        e_hist0 = jnp.zeros((maxiter + 1, P), rdtype)
        prev0 = last_node(states[0].u)
        no_prev = jnp.zeros((P,), bool)

        def check(states, uends, res_hist, e_hist, prev_last, k):
            states = list(states)
            uends = list(uends)
            states[0], uends[0] = parts.exchange(
                0, states[0], uends[0], t_arr, dts, window, no_prev
            )
            res = blocks[0].raw.residual(states[0], dts[0])
            res_hist = res_hist.at[k].set(jnp.where(window, res.astype(rdtype), res_hist[k]))
            cur = last_node(states[0].u)
            e = step_norm(jax.tree_util.tree_map(lambda a, b: a - b, cur, prev_last))
            if rel_error:
                e = e / step_norm(cur)
            e_hist = e_hist.at[k].set(jnp.where(window, e.astype(rdtype), e_hist[k]))
            return tuple(states), tuple(uends), res_hist, e_hist, cur

        def body(k, carry):
            states, uends, res_hist, e_hist, prev_last = carry
            states, uends, res_hist, e_hist, prev_last = check(
                states, uends, res_hist, e_hist, prev_last, k
            )
            states, uends = parts.iteration_work(states, uends, t_arr, dts, window, no_prev)
            return states, uends, res_hist, e_hist, prev_last

        carry = jax.lax.fori_loop(
            0, maxiter, body, (tuple(states), tuple(uends), res_hist0, e_hist0, prev0)
        )
        # prev_last entering the final check = u^{maxiter-1}[-1]; the host
        # injects it as L.uold so the genuine EstimateEmbeddedError policy
        # computes the final estimate itself (advance_fused_adaptive)
        prev_last = carry[-1]
        states, uends, res_hist, e_hist, _ = check(*carry, maxiter)
        return states[0], uends[0], res_hist, e_hist, prev_last

    return fused_adaptive


def build_fused_many(ctrl, fused):
    """Scan the single-block program over consecutive FULL blocks.

    The uend -> next-u0 chain stays on device, so a whole time-marching run
    (serial SDC included, P=1) executes with zero host syncs; iteration
    counts and residual histories come back stacked per block."""
    P = ctrl.num_procs
    window = jnp.ones((P,), bool)

    def fused_many(u0, dt, starts):
        def block(u_carry, t_start):
            t_arr = t_start + dt * jnp.arange(P)
            uend_block, iters, res_hist, _ = fused(u_carry, t_arr, dt, window)
            return uend_block[P - 1], (iters, res_hist)

        uend, (iters_all, res_all) = jax.lax.scan(block, u0, starts)
        return uend, iters_all, res_all

    return fused_many


def run_fused(ctrl, u0, t0, Tend):
    """Whole-block device-resident run loop for a ShardedController.

    Mirrors ControllerNonMPI.run's block marching (without restarts, which
    eligibility excludes) and returns ``(uend, stats)`` with the default
    stats entries synthesized from the device-returned iteration counts and
    residual history.
    """
    from pysdc_tpu.parallel.nonmpi import _horizon_slack

    check_fused_eligibility(ctrl)
    if getattr(ctrl, '_fused_fn', None) is None:
        raw = build_fused_block(ctrl)
        ctrl._fused_fn = jax.jit(raw)
        ctrl._fused_many_fn = jax.jit(build_fused_many(ctrl, raw))

    for hook in ctrl.hooks:
        hook.reset_stats()
    hooks0 = ctrl.hooks[0]

    P = ctrl.num_procs
    dt = float(ctrl.MS[0].levels[0].params.dt)
    maxiter = int(ctrl.MS[0].params.maxiter)
    nsw = ctrl.nsweeps[0]
    slack = _horizon_slack(Tend)
    # time scalars enter the device program in the problem's dtype: wider
    # (x64-default) scalars would promote the f32 carry and break the
    # while_loop's fixed-point typing
    wdtype = ctrl.blocks[0].level.prob.dtype or jnp.float64

    converged = True

    def emit_stats(t_block, iters_h, res_h, n_active):
        nonlocal converged
        for p in range(n_active):
            t_p = float(t_block + dt * p)
            niter = int(iters_h[p])
            converged = converged and niter < maxiter
            for it in range(1, niter + 1):
                hooks0.add_to_stats(
                    process=p, time=t_p, level=-1, iter=it, sweep=nsw,
                    type='residual_post_iteration', value=float(res_h[it, p]),
                )
            final_sweep = nsw if niter > 0 else 1
            for typ, val in (
                ('niter', niter),
                ('residual_post_step', float(res_h[niter, p])),
                ('dt', dt),
                ('restart', 0),  # restarts are ineligible here; LogRestarts parity
            ):
                hooks0.add_to_stats(
                    process=p, time=t_p, level=0, iter=niter, sweep=final_sweep,
                    type=typ, value=val,
                )

    uend = jnp.asarray(u0)
    t = t0
    n_steps = int(np.ceil((Tend - t0 - slack) / dt))
    n_full = n_steps // P
    if n_full > 0:
        # all full blocks march in ONE device program (scan over blocks)
        starts = jnp.asarray(t0 + dt * P * np.arange(n_full), wdtype)
        uend, iters_all, res_all = ctrl._fused_many_fn(uend, jnp.asarray(dt, wdtype), starts)
        iters_all = np.asarray(iters_all)
        res_all = np.asarray(res_all)
        for b in range(n_full):
            emit_stats(t0 + b * P * dt, iters_all[b], res_all[b], P)
        t = t0 + n_full * P * dt

    while t < Tend - slack:  # partial tail block (prefix window)
        n_active = min(P, int(np.ceil((Tend - t - slack) / dt)))
        window = jnp.asarray(np.arange(P) < n_active)
        t_arr = jnp.asarray(t + dt * np.arange(P), wdtype)
        uend_block, iters, res_hist, _ = ctrl._fused_fn(uend, t_arr, jnp.asarray(dt, wdtype), window)
        emit_stats(t, np.asarray(iters), np.asarray(res_hist), n_active)
        uend = uend_block[n_active - 1]
        t += n_active * dt

    ctrl._fused_converged = converged
    return uend, ctrl.return_stats()


def advance_fused_adaptive(ctrl, block):
    """One whole-block device call replacing the entire stage machine.

    Runs the fixed-depth adaptive block program, then replays the hook
    points and the genuine IT_CHECK policy sequence on the shadow steps from
    the fetched histories — adaptivity's dt proposal, limiter clamping,
    restart cascading and stats entries all run through the SAME policy
    objects as the stage machine (``nonmpi.py _route_after_check``).
    Returns True (the block is complete) for the inherited ``run`` driver.
    """
    stages = {s.status.stage for s in block}
    if stages != {'SPREAD'}:
        raise ControllerError(f'adaptive fused block must start at SPREAD, got {sorted(stages)}')

    for step in block:
        ctrl._fire('pre_step', step, 0)
        for policy in ctrl._policies():
            policy.post_spread_processing(ctrl, step, MS=block)

    # per-level dts: after adaptive restarts only the finest level carries
    # the new dt; coarser levels keep theirs (reference per-level spreading,
    # spread_step_sizes.py:133-154)
    dts = jnp.asarray(
        [ctrl._block_dt(block, l) for l in range(ctrl.nlevels)],
        ctrl.blocks[0].level.prob.dtype or jnp.float64,
    )
    wdtype = ctrl.blocks[0].level.prob.dtype or jnp.float64
    t_arr = jnp.asarray(np.asarray(ctrl._block_times(), dtype=np.float64), wdtype)
    window = ctrl._mask_of(block)
    u0 = jnp.asarray(block[0].u0)
    fine_state, uend_block, res_hist, e_hist, prev_last = ctrl._fused_adaptive_fn(
        u0, t_arr, dts, window
    )
    ctrl.blocks[0].state = fine_state
    ctrl.blocks[0].uend = uend_block
    # the ONE host sync of the block
    res_h = np.asarray(res_hist)
    e_h = np.asarray(e_hist)

    maxiter = int(ctrl.MS[0].params.maxiter)
    nsw = ctrl.nsweeps[0]
    eps = np.finfo(float).eps

    # the linearized flavor displays the chain-differenced estimate
    # |raw_j - raw_{j-1}| per check (estimate_embedded_error.py); raws come
    # straight from the device history, the differencing is host arithmetic
    from pysdc_tpu.convergence.estimate_embedded_error import (
        EstimateEmbeddedErrorLinearized,
    )

    linearized = next(
        (C for C in ctrl.convergence_controllers
         if type(C) is EstimateEmbeddedErrorLinearized), None
    )

    def displayed_estimates(k):
        raws = e_h[k]
        if linearized is None:
            return raws
        out = np.empty_like(raws)
        prev = 0.0
        for j in range(len(raws)):
            scale = (j + 1) if linearized.params.averaged else 1.0
            out[j] = abs(raws[j] - prev) / scale
            if not linearized.params.averaged:
                prev = raws[j]
        return out

    def set_check_status(step, k):
        j = step.status.slot
        step.status.iter = k
        L = step.levels[0]
        L.status.sweep = nsw
        if 'IT_CHECK' in L.sweep.skip_residual_computation:
            # direct solvers (RK) skip residuals; mirror _set_residuals
            if L.status.residual is None:
                L.status.residual = 0.0
        else:
            L.status.residual = float(res_h[k, j])
            L.status.updated = False

    # replay iterations 1..maxiter-1 (hook entries only; no policy acts
    # before the final iteration in this stack).  The embedded-error status
    # is updated AFTER firing post_iteration — the stage machine's hook
    # logs the previous check's estimate because the estimator policy runs
    # after the hook (nonmpi.py _route_after_check ordering).
    for k in range(1, maxiter):
        shown = displayed_estimates(k)
        for step in block:
            set_check_status(step, k)
            ctrl._fire('pre_iteration', step, 0)
            ctrl._fire('post_iteration', step, 0)
            L = step.levels[0]
            L.status.error_embedded_estimate = max(float(shown[step.status.slot]), eps)
            L.status.increment = L.status.error_embedded_estimate

    # final IT_CHECK through the genuine hook + policy sequence: the shadow
    # levels get live state views plus an uold whose last node is the
    # device-tracked pre-final-iteration snapshot, so EstimateEmbeddedError
    # itself computes the estimate Adaptivity acts on
    ctrl._sync_level(block, 0)
    for step in block:
        set_check_status(step, maxiter)
        L = step.levels[0]
        j = step.status.slot
        L.uold = jax.tree_util.tree_map(
            lambda a, p: a.at[-1].set(p[j]), L.state.u, prev_last
        )
        if maxiter == 1 and getattr(L.sweep, 'is_embedded', None) and L.sweep.is_embedded():
            # check-#0 parity for direct embedded (RK) sweepers: the
            # estimator also runs at iter=0 there, and from the spread
            # predictor both weight rows contract identical f's, so the raw
            # gap is exactly zero -> the eps floor the stage machine stores
            L.status.error_embedded_estimate = eps
            L.status.increment = eps
    ctrl._route_after_check(block)
    if not all(s.status.done for s in block):
        raise ControllerError('adaptive fused block did not complete at maxiter')
    return True


def run_fused_adaptive(ctrl, u0, t0, Tend):
    """Device-resident run loop for adaptive configurations.

    Reuses the inherited block driver (``ControllerNonMPI.run``: restart
    cuts, window bookkeeping, prepare_next_block ordering, Tend landing)
    verbatim; only the inner stage machine is replaced by
    :func:`advance_fused_adaptive` via the ``_fused_adaptive`` mode flag.
    One device program + one host fetch per block instead of per-sweep
    syncs.
    """
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI

    check_fused_adaptive_eligibility(ctrl)
    if getattr(ctrl, '_fused_adaptive_fn', None) is None:
        ctrl._fused_adaptive_fn = jax.jit(build_fused_adaptive_block(ctrl))
    ctrl._fused_adaptive = True
    try:
        return ControllerNonMPI.run(ctrl, u0, t0, Tend)
    finally:
        ctrl._fused_adaptive = False
