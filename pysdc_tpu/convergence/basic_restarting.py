"""Block restarting driven by adaptivity/resilience policies.

Mirrors the reference ``BasicRestartingNonMPI``
(``implementations/convergence_controller_classes/basic_restarting.py:9-218``):
every step after the first one flagged for restart restarts too, with a
patience limit ``max_restarts``.
"""

from __future__ import annotations

from types import SimpleNamespace

from pysdc_tpu.core.convergence import ConvergenceController
from pysdc_tpu.core.errors import ConvergenceError


class BasicRestarting(ConvergenceController):
    def __init__(self, controller, params, description, **kwargs):
        super().__init__(controller, params, description, **kwargs)
        self.buffers = SimpleNamespace(restart=False, max_restart_reached=False)

    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': 95,
            'max_restarts': 10,
            'crash_after_max_restarts': True,
            'restart_from_first_step': False,
        }
        from pysdc_tpu.hooks.logging_hooks import LogRestarts

        controller.add_hook(LogRestarts)
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def dependencies(self, controller, description, **kwargs):
        from pysdc_tpu.convergence.spread_step_sizes import SpreadStepSizesBlockwise

        controller.add_convergence_controller(
            SpreadStepSizesBlockwise,
            description=description,
            params={'spread_from_first_restarted': not self.params.restart_from_first_step},
        )

    def setup_status_variables(self, controller, **kwargs):
        self.add_status_variable_to_step('restart', False)
        self.add_status_variable_to_step('restarts_in_a_row', 0)

    def reset_status_variables(self, controller, **kwargs):
        self.set_step_status_variable('restart', False)

    def reset_buffers_nonMPI(self, controller, **kwargs):
        self.buffers.restart = False
        self.buffers.max_restart_reached = False

    def determine_restart(self, controller, S, MS=None, **kwargs):
        if S.status.first:
            self.buffers.max_restart_reached = S.status.restarts_in_a_row >= self.params.max_restarts
            if self.buffers.max_restart_reached and S.status.restart:
                if self.params.crash_after_max_restarts:
                    raise ConvergenceError(
                        f'Restarted {S.status.restarts_in_a_row} time(s) already, surrendering now.'
                    )
                self.log(
                    f'Step(s) restarted {S.status.restarts_in_a_row} time(s) already, maximum reached, moving on...',
                    S,
                )
        self.buffers.restart = S.status.restart or self.buffers.restart
        S.status.restart = (S.status.restart or self.buffers.restart) and not self.buffers.max_restart_reached

        if S.status.last and self.params.restart_from_first_step and not self.buffers.max_restart_reached:
            for step in MS:
                step.status.restart = self.buffers.restart

    def prepare_next_block(self, controller, S, size, time, Tend, MS=None, **kwargs):
        if S not in MS:
            return
        restart_from = min([me.status.slot for me in MS if me.status.restart] + [size - 1])
        if S.status.slot < restart_from:
            MS[restart_from - S.status.slot].status.restarts_in_a_row = 0
        else:
            step = MS[S.status.slot - restart_from]
            step.status.restarts_in_a_row = S.status.restarts_in_a_row + 1 if S.status.restart else 0
