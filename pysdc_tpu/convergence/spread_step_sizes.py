"""Spread the adapted step size across the next PFASST block.

Mirrors the reference ``SpreadStepSizesBlockwiseNonMPI``
(``implementations/convergence_controller_classes/spread_step_sizes.py``).
"""

from __future__ import annotations

import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController


class SpreadStepSizesBlockwise(ConvergenceController):
    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': +100,
            'spread_from_first_restarted': True,
            'overwrite_to_reach_Tend': True,
        }
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def get_step_from_which_to_spread(self, MS, S):
        restarts = [me.status.restart for me in MS]
        new_steps = [
            me.levels[0].status.dt_new if me.levels[0].status.dt_new else 1e9 for me in MS
        ]
        if True in restarts:
            restart_at = int(np.where(restarts)[0][0])
            if self.params.spread_from_first_restarted:
                spread_from_step = restart_at
            else:
                spread_from_step = restart_at + int(np.argmin(new_steps[restart_at:]))
        else:
            restart_at = len(MS) - 1
            spread_from_step = restart_at
        return spread_from_step, restart_at

    def prepare_next_block(self, controller, S, size, time, Tend, MS=None, **kwargs):
        if S not in MS:
            return
        spread_from_step, restart_at = self.get_step_from_which_to_spread(MS, S)

        dt_all = [0.0] + [me.dt for me in MS if not me.status.first]
        dt_max = (
            (Tend - time[restart_at] - dt_all[restart_at]) / size
            if self.params.overwrite_to_reach_Tend
            else np.inf
        )

        new_steps = [None] * len(S.levels)
        for i, l in enumerate(MS[spread_from_step].levels):
            proposed = l.status.dt_new if l.status.dt_new is not None else l.params.dt
            new_steps[i] = min(proposed, max(dt_max, l.params.dt_initial))
            if new_steps[i] < proposed and i == 0 and l.status.dt_new is not None:
                self.log(f'Overwriting stepsize control to reach Tend: {Tend:.2e}! New step size: {new_steps[i]:.2e}', S)

        for i in range(len(S.levels)):
            S.levels[i].params.dt = new_steps[i]
