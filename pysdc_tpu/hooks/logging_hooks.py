"""Logging hooks: solutions, errors, work, step sizes, restarts.

Counterparts of the reference hook library (``implementations/hooks/``):
LogSolution, LogSolutionAfterIteration (log_solution.py:9-68),
LogGlobalErrorPostStep/PostIter, LogLocalErrorPostStep (log_errors.py),
LogEmbeddedErrorEstimate (log_embedded_error_estimate.py),
LogWork / LogSDCIterations (log_work.py), LogStepSize (log_step_size.py),
LogRestarts (log_restarts.py).  Stats keys/types match the reference so
``get_sorted(stats, type='e_global_post_step')`` etc. work identically.
"""

from __future__ import annotations

import numpy as np

from pysdc_tpu.core.hooks import Hooks
from pysdc_tpu.core.state import norm_max


def _entry_kwargs(step, level_number):
    L = step.levels[level_number]
    return dict(
        process=step.status.slot,
        process_sweeper=getattr(L.sweep, 'rank', 0),
        time=L.time,
        level=L.level_index,
        iter=step.status.iter,
        sweep=L.status.sweep,
    )


class LogSolution(Hooks):
    """Log u (and uend) after each step as type 'u'."""

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        L.compute_end_point()
        kw = _entry_kwargs(step, level_number)
        kw['time'] = L.time + L.dt
        self.add_to_stats(value=np.asarray(L.uend), type='u', **kw)


class LogSolutionAfterIteration(Hooks):
    def post_iteration(self, step, level_number):
        super().post_iteration(step, level_number)
        L = step.levels[level_number]
        L.compute_end_point()
        kw = _entry_kwargs(step, level_number)
        kw['time'] = L.time + L.dt
        self.add_to_stats(value=np.asarray(L.uend), type='u', **kw)


class LogError(Hooks):
    """Base with global/local error computation (reference log_errors.py:5)."""

    def log_global_error(self, step, level_number, suffix=''):
        L = step.levels[level_number]
        L.compute_end_point()
        try:
            u_ref = L.prob.u_exact(L.time + L.dt)
        except NotImplementedError:
            return
        e = float(norm_max(L.uend - u_ref))
        kw = _entry_kwargs(step, level_number)
        kw['time'] = L.time + L.dt
        self.add_to_stats(value=e, type=f'e_global{suffix}', **kw)
        denom = float(norm_max(u_ref))
        if denom > 0:
            self.add_to_stats(value=e / denom, type=f'e_global_rel{suffix}', **kw)

    def log_local_error(self, step, level_number, suffix=''):
        L = step.levels[level_number]
        L.compute_end_point()
        try:
            u_loc = L.prob.u_exact(L.time + L.dt, u_init=L.u[0], t_init=L.time)
        except (NotImplementedError, TypeError):
            return
        e = float(norm_max(L.uend - u_loc))
        kw = _entry_kwargs(step, level_number)
        kw['time'] = L.time + L.dt
        self.add_to_stats(value=e, type=f'e_local{suffix}', **kw)


class LogGlobalErrorPostStep(LogError):
    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        self.log_global_error(step, level_number, suffix='_post_step')


class LogGlobalErrorPostIter(LogError):
    def post_iteration(self, step, level_number):
        super().post_iteration(step, level_number)
        self.log_global_error(step, level_number, suffix='_post_iteration')


class LogLocalErrorPostStep(LogError):
    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        self.log_local_error(step, level_number, suffix='_post_step')


class LogLocalErrorPostIter(LogError):
    def post_iteration(self, step, level_number):
        super().post_iteration(step, level_number)
        self.log_local_error(step, level_number, suffix='_post_iteration')


class LogEmbeddedErrorEstimate(Hooks):
    """Log the embedded error estimate after each iteration/step."""

    def log_error(self, step, level_number, appendix=''):
        L = step.levels[level_number]
        est = getattr(L.status, 'error_embedded_estimate', None)
        if est is not None:
            self.add_to_stats(
                value=est, type=f'error_embedded_estimate{appendix}', **_entry_kwargs(step, level_number)
            )

    def post_iteration(self, step, level_number):
        super().post_iteration(step, level_number)
        self.log_error(step, level_number)

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        self.log_error(step, level_number, appendix='_post_step')


class LogWork(Hooks):
    """Log work counters per step (reference log_work.py:4-56)."""

    def __init__(self):
        super().__init__()
        self.__work_last_step = {}

    def pre_step(self, step, level_number):
        super().pre_step(step, level_number)
        L = step.levels[level_number]
        self.__work_last_step[level_number] = {
            key: counter.niter for key, counter in L.prob.work_counters.items()
        }

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        kw = _entry_kwargs(step, level_number)
        kw['time'] = L.time + L.dt
        for key, counter in L.prob.work_counters.items():
            self.add_to_stats(
                value=counter.niter - self.__work_last_step[level_number].get(key, 0),
                type=f'work_{key}',
                **kw,
            )


class LogSDCIterations(Hooks):
    """Log the number of SDC iterations per step as 'k'."""

    name = 'k'

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        kw = _entry_kwargs(step, level_number)
        kw['time'] = L.time + L.dt
        self.increment_stats(value=step.status.iter, type=self.name, **kw)


class LogStepSize(Hooks):
    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        self.add_to_stats(value=L.dt, type='dt', **_entry_kwargs(step, level_number))


class LogRestarts(Hooks):
    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        self.add_to_stats(
            value=int(getattr(step.status, 'restart', False)),
            type='restart',
            **_entry_kwargs(step, level_number),
        )
