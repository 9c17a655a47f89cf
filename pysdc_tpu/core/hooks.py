"""Hooks and statistics.

Same observability contract as the reference (``pySDC/core/hooks.py:9-245``):
16 hook points driven by the controllers, a stats dictionary keyed by the
``Entry`` namedtuple, and a default hook recording residuals/iteration
counts.  Hooks are pure host-side observers — they read scalars off the
device lazily (device->host sync happens only when a hook actually records).
"""

from __future__ import annotations

import logging
import time as _time
from collections import namedtuple
from typing import Any, Dict, Optional

#: stats key (reference core/hooks.py:9-19)
Entry = namedtuple('Entry', ['process', 'process_sweeper', 'time', 'level', 'iter', 'sweep', 'type', 'num_restarts'])


def _to_float(value):
    """Convert device scalars to host floats for storage in stats."""
    try:
        import jax

        if isinstance(value, jax.Array):
            return float(value)
    except Exception:
        pass
    return value


class Hooks:
    """Base hook class; subclasses override any of the 16 hook points."""

    meta_data = {}

    def __init__(self):
        self.logger = logging.getLogger('hooks')
        self.__num_restarts = 0
        self.__stats: Dict[Entry, Any] = {}
        self.__entry = Entry

    @property
    def num_restarts(self):
        return self.__num_restarts

    def _set_num_restarts(self, n):
        self.__num_restarts = n

    def add_to_stats(self, value, process, time, level, iter, sweep, type, process_sweeper=0):
        """Add a value to the stats dict (reference hooks.py:52)."""
        self.__stats[
            self.__entry(
                process=process,
                process_sweeper=process_sweeper,
                time=time,
                level=level,
                iter=iter,
                sweep=sweep,
                type=type,
                num_restarts=self.__num_restarts,
            )
        ] = _to_float(value)

    def increment_stats(self, value, initialize=None, process=None, time=None, level=None, iter=None, sweep=None, type=None, process_sweeper=0):
        """Add to an existing stats entry or initialize it (hooks.py:68)."""
        key = self.__entry(
            process=process,
            process_sweeper=process_sweeper,
            time=time,
            level=level,
            iter=iter,
            sweep=sweep,
            type=type,
            num_restarts=self.__num_restarts,
        )
        if key in self.__stats:
            self.__stats[key] += _to_float(value)
        elif initialize is not None:
            self.__stats[key] = _to_float(initialize)
        else:
            self.__stats[key] = _to_float(value)

    def return_stats(self):
        return self.__stats

    def reset_stats(self):
        self.__stats = {}

    # -- the 16 hook points (reference hooks.py:106-245) ----------------
    def pre_setup(self, step, level_number):
        self._update_restarts(step)

    def pre_run(self, step, level_number):
        self._update_restarts(step)

    def pre_predict(self, step, level_number):
        self._update_restarts(step)

    def pre_step(self, step, level_number):
        self._update_restarts(step)

    def pre_iteration(self, step, level_number):
        self._update_restarts(step)

    def pre_sweep(self, step, level_number):
        self._update_restarts(step)

    def pre_comm(self, step, level_number):
        self._update_restarts(step)

    def post_comm(self, step, level_number, add_to_stats=False):
        self._update_restarts(step)

    def post_sweep(self, step, level_number):
        self._update_restarts(step)

    def post_iteration(self, step, level_number):
        self._update_restarts(step)

    def post_step(self, step, level_number):
        self._update_restarts(step)

    def post_predict(self, step, level_number):
        self._update_restarts(step)

    def post_run(self, step, level_number):
        self._update_restarts(step)

    def post_setup(self, step, level_number):
        self._update_restarts(step)

    def _update_restarts(self, step):
        if step is not None:
            self._set_num_restarts(getattr(step.status, 'restarts_in_a_row', 0))


class DefaultHooks(Hooks):
    """Records residuals and iteration counts, mirroring the reference
    ``DefaultHooks`` (implementations/hooks/default_hook.py)."""

    def post_sweep(self, step, level_number):
        super().post_sweep(step, level_number)
        lvl = step.levels[level_number]
        self.logger.info(
            'Process %2i on time %8.6f at stage %15s: Level: %s -- Iteration: %2i -- Sweep: %2i -- residual: %12.8e',
            step.status.slot,
            lvl.time,
            step.status.stage,
            lvl.level_index,
            step.status.iter,
            lvl.status.sweep,
            float(lvl.status.residual) if lvl.status.residual is not None else float('nan'),
        )
        self.add_to_stats(
            process=step.status.slot,
            process_sweeper=lvl.sweep.rank if hasattr(lvl.sweep, 'rank') else 0,
            time=lvl.time,
            level=lvl.level_index,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='residual_post_sweep',
            value=lvl.status.residual,
        )

    def post_iteration(self, step, level_number):
        super().post_iteration(step, level_number)
        lvl = step.levels[level_number]
        self.add_to_stats(
            process=step.status.slot,
            process_sweeper=0,
            time=lvl.time,
            level=-1,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='residual_post_iteration',
            value=lvl.status.residual,
        )

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        lvl = step.levels[level_number]
        self.add_to_stats(
            process=step.status.slot,
            process_sweeper=0,
            time=lvl.time,
            level=lvl.level_index,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='niter',
            value=step.status.iter,
        )
        self.add_to_stats(
            process=step.status.slot,
            process_sweeper=0,
            time=lvl.time,
            level=lvl.level_index,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='residual_post_step',
            value=lvl.status.residual,
        )
        # fine-level dt actually used for this step
        self.add_to_stats(
            process=step.status.slot,
            process_sweeper=0,
            time=lvl.time,
            level=lvl.level_index,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='dt',
            value=lvl.dt,
        )


class CPUTimings(Hooks):
    """Wall-clock timings per run/step/iteration/sweep/comm, mirroring the
    reference ``CPUTimings`` (implementations/hooks/log_timings.py:316)."""

    def __init__(self):
        super().__init__()
        self._t = {}

    def _start(self, key):
        self._t[key] = _time.perf_counter()

    def _stop(self, key):
        # unmatched stops (a post_* hook point whose pre_* never fired, e.g.
        # predictor-internal sweeps) report 0.0 — the old pop-default form
        # returned small NEGATIVE durations because the left operand of the
        # subtraction is evaluated before the default timestamp
        start = self._t.pop(key, None)
        return 0.0 if start is None else _time.perf_counter() - start

    def pre_run(self, step, level_number):
        super().pre_run(step, level_number)
        self._start('run')

    def post_run(self, step, level_number):
        super().post_run(step, level_number)
        lvl = step.levels[level_number]
        self.add_to_stats(
            process=step.status.slot, time=lvl.time, level=-1, iter=-1, sweep=-1, type='timing_run', value=self._stop('run')
        )

    def pre_step(self, step, level_number):
        super().pre_step(step, level_number)
        self._start(('step', step.status.slot))

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        lvl = step.levels[level_number]
        self.add_to_stats(
            process=step.status.slot,
            time=lvl.time,
            level=level_number,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='timing_step',
            value=self._stop(('step', step.status.slot)),
        )

    def pre_iteration(self, step, level_number):
        super().pre_iteration(step, level_number)
        self._start(('iter', step.status.slot))

    def post_iteration(self, step, level_number):
        super().post_iteration(step, level_number)
        lvl = step.levels[level_number]
        self.add_to_stats(
            process=step.status.slot,
            time=lvl.time,
            level=level_number,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='timing_iteration',
            value=self._stop(('iter', step.status.slot)),
        )

    def pre_sweep(self, step, level_number):
        super().pre_sweep(step, level_number)
        self._start(('sweep', step.status.slot, level_number))

    def post_sweep(self, step, level_number):
        super().post_sweep(step, level_number)
        lvl = step.levels[level_number]
        self.add_to_stats(
            process=step.status.slot,
            time=lvl.time,
            level=level_number,
            iter=step.status.iter,
            sweep=lvl.status.sweep,
            type='timing_sweep',
            value=self._stop(('sweep', step.status.slot, level_number)),
        )


class DeviceTimings(CPUTimings):
    """Device-accurate per-stage timings — the TPU analog of the reference's
    ``GPUTimings`` (implementations/hooks/log_timings.py:328-340, CUDA
    events).  JAX dispatch is asynchronous, so plain wall-clock at a stage
    boundary measures enqueue time, not device execution; this hook forces
    the level's state to FINISH on device at every pre/post boundary before
    reading the clock (``block_until_ready`` plus a scalar readback — the
    axon tunnel can release ``block_until_ready`` early).  The stats carry
    the same ``timing_run/step/iteration/sweep`` entry types as CPUTimings,
    now bounding real device work per stage.

    Opt-in, exactly like the reference registers GPUTimings only on GPU
    runs: the forced syncs serialize the dispatch pipeline (the same price
    CUDA events pay at ``synchronize``), and per-sweep syncs are
    incompatible with the fused device-resident lanes — registering this
    hook routes the run onto the stage machine.
    """

    def _sync(self, step, level_number):
        if step is None:
            return
        try:
            lvl = step.levels[level_number]
        except (IndexError, TypeError):
            return
        state = getattr(lvl, 'state', None)
        u = getattr(state, 'u', None) if state is not None else None
        if u is not None:
            import jax as _jax
            import jax.numpy as _jnp

            _jax.block_until_ready(u)
            float(_jnp.reshape(u, (-1,))[0])  # forced device->host readback

    def pre_run(self, step, level_number):
        self._sync(step, level_number)
        super().pre_run(step, level_number)

    def post_run(self, step, level_number):
        self._sync(step, level_number)
        super().post_run(step, level_number)

    def pre_step(self, step, level_number):
        self._sync(step, level_number)
        super().pre_step(step, level_number)

    def post_step(self, step, level_number):
        self._sync(step, level_number)
        super().post_step(step, level_number)

    def pre_iteration(self, step, level_number):
        self._sync(step, level_number)
        super().pre_iteration(step, level_number)

    def post_iteration(self, step, level_number):
        self._sync(step, level_number)
        super().post_iteration(step, level_number)

    def pre_sweep(self, step, level_number):
        self._sync(step, level_number)
        super().pre_sweep(step, level_number)

    def post_sweep(self, step, level_number):
        self._sync(step, level_number)
        super().post_sweep(step, level_number)
