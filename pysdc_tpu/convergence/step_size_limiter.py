"""Step size limiting/rounding policies.

Mirrors reference ``StepSizeLimiter`` / ``StepSizeSlopeLimiter`` /
``StepSizeRounding`` (convergence_controller_classes/step_size_limiter.py).
"""

from __future__ import annotations

import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController


class StepSizeLimiter(ConvergenceController):
    def setup(self, controller, params, description, **kwargs):
        defaults = {'control_order': +92, 'dt_min': 0, 'dt_max': np.inf}
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def dependencies(self, controller, description, **kwargs):
        slope_keys = ['dt_slope_min', 'dt_slope_max', 'dt_rel_min_slope']
        available = {k: getattr(self.params, k) for k in slope_keys if hasattr(self.params, k)}
        if available:
            available['control_order'] = self.params.control_order - 1
            controller.add_convergence_controller(
                StepSizeSlopeLimiter, params=available, description=description
            )

    def get_new_step_size(self, controller, S, **kwargs):
        for L in S.levels:
            if L.status.dt_new is not None:
                if L.status.dt_new < self.params.dt_min:
                    self.log(
                        f'Step size below minimum, increasing from {L.status.dt_new:.2e} to {self.params.dt_min:.2e}',
                        S,
                    )
                    L.status.dt_new = self.params.dt_min
                elif L.status.dt_new > self.params.dt_max:
                    self.log(
                        f'Step size exceeds maximum, decreasing from {L.status.dt_new:.2e} to {self.params.dt_max:.2e}',
                        S,
                    )
                    L.status.dt_new = self.params.dt_max


class StepSizeSlopeLimiter(ConvergenceController):
    def setup(self, controller, params, description, **kwargs):
        defaults = {'control_order': 91, 'dt_slope_min': 0, 'dt_slope_max': np.inf, 'dt_rel_min_slope': 0}
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def get_new_step_size(self, controller, S, **kwargs):
        for L in S.levels:
            if L.status.dt_new is not None:
                if L.status.dt_new / L.params.dt < self.params.dt_slope_min:
                    L.status.dt_new = L.params.dt * self.params.dt_slope_min
                elif L.status.dt_new / L.params.dt > self.params.dt_slope_max:
                    L.status.dt_new = L.params.dt * self.params.dt_slope_max
                if (
                    abs(L.status.dt_new - L.params.dt) / L.params.dt < self.params.dt_rel_min_slope
                    and not S.status.restart
                ):
                    L.status.dt_new = L.params.dt


class StepSizeRounding(ConvergenceController):
    """Round the step size to nicer values (keeps jit caches warm too)."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {'control_order': +93, 'digits': 1, 'fac': 5}
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    @staticmethod
    def _round_step_size(dt, fac, digits):
        dt_rounded = None
        exponent = np.log10(dt) // 1
        dt_norm = dt / 10 ** (exponent - digits)
        dt_norm_round = (dt_norm // fac) * fac
        dt_rounded = dt_norm_round * 10 ** (exponent - digits)
        return dt_rounded

    def get_new_step_size(self, controller, S, **kwargs):
        for L in S.levels:
            if L.status.dt_new is not None:
                dt_rounded = self._round_step_size(L.status.dt_new, self.params.fac, self.params.digits)
                if L.status.dt_new != dt_rounded:
                    self.log(
                        f'Step size rounded from {L.status.dt_new:.6e} to {dt_rounded:.6e}',
                        S,
                    )
                    L.status.dt_new = dt_rounded
