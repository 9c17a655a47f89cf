"""Embedded error estimate from order-mismatched solutions.

Mirrors reference ``EstimateEmbeddedError``
(convergence_controller_classes/estimate_embedded_error.py:9-150): for SDC
the difference of two consecutive sweeps at the last node, for embedded RK
pairs the difference of the two weight rows.
"""

from __future__ import annotations

import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController
from pysdc_tpu.core.state import norm_max
from pysdc_tpu.sweepers.runge_kutta import RungeKutta


class EstimateEmbeddedError(ConvergenceController):
    @classmethod
    def get_implementation(cls, flavor='standard', useMPI=False):
        """Flavor dispatch (reference estimate_embedded_error.py:18-38)."""
        if flavor == 'standard':
            return EstimateEmbeddedError
        if flavor == 'linearized':
            return EstimateEmbeddedErrorLinearized
        if flavor == 'collocation':
            return EstimateEmbeddedErrorCollocation
        raise NotImplementedError(f'no embedded-error flavor named {flavor!r}')

    def setup(self, controller, params, description, **kwargs):
        sweeper_type = 'RK' if RungeKutta in description['sweeper_class'].__mro__ else 'SDC'
        return {
            'control_order': -80,
            'sweeper_type': sweeper_type,
            'rel_error': False,
            **super().setup(controller, params, description, **kwargs),
        }

    def dependencies(self, controller, description, **kwargs):
        if RungeKutta not in description['sweeper_class'].__mro__:
            from pysdc_tpu.convergence.store_uold import StoreUOld

            controller.add_convergence_controller(StoreUOld, description=description)
        from pysdc_tpu.hooks.logging_hooks import LogEmbeddedErrorEstimate

        controller.add_hook(LogEmbeddedErrorEstimate)

    def setup_status_variables(self, controller, **kwargs):
        self.add_status_variable_to_level('error_embedded_estimate')
        self.add_status_variable_to_level('increment')

    def estimate_embedded_error_serial(self, L):
        if self.params.sweeper_type == 'RK':
            L.compute_end_point()
            err = norm_max(L.uend - L.uend_secondary)
            if self.params.rel_error:
                err = err / norm_max(L.uend)
            return float(err)
        if self.params.sweeper_type == 'SDC':
            # order rises by one between sweeps
            err = norm_max(L.uold[-1] - L.state.u[-1])
            if self.params.rel_error:
                err = err / norm_max(L.state.u[-1])
            return float(err)
        raise NotImplementedError(f'unknown sweeper type {self.params.sweeper_type}')

    def post_iteration_processing(self, controller, S, **kwargs):
        if S.status.iter > 0 or self.params.sweeper_type == 'RK':
            for L in S.levels:
                if L.state is None or (L.uold is None and self.params.sweeper_type == 'SDC'):
                    continue
                e = max(self.estimate_embedded_error_serial(L), np.finfo(float).eps)
                L.status.error_embedded_estimate = e
                L.status.increment = e


class EstimateEmbeddedErrorLinearized(EstimateEmbeddedError):
    """Block-parallel embedded error (reference
    estimate_embedded_error.py:154-229, EstimateEmbeddedErrorLinearizedNonMPI):
    in block Gauss-Seidel/Jacobi MSSDC the raw sweep difference on step j is a
    *semi-global* error of the whole chain up to j; subtracting the previous
    step's raw estimate linearizes it back to a local error so adaptivity does
    not collapse dt on long blocks."""

    def __init__(self, controller, params, description, **kwargs):
        super().__init__(controller, params, description, **kwargs)
        from types import SimpleNamespace

        self.buffers = SimpleNamespace(e_em_last=0.0)

    def setup(self, controller, params, description, **kwargs):
        return {'averaged': False, **super().setup(controller, params, description, **kwargs)}

    def reset_buffers_nonMPI(self, controller, **kwargs):
        self.buffers.e_em_last = 0.0

    def post_iteration_processing(self, controller, S, **kwargs):
        if len(S.levels) > 1 and len(controller.MS) > 1:
            raise NotImplementedError(
                'the linearized estimate supports either multiple levels or multiple steps, not both'
            )
        if S.status.iter > 0 or self.params.sweeper_type == 'RK':
            divisor = float(S.status.slot + 1) if self.params.averaged else 1.0
            raw = None
            for L in S.levels:
                if L.state is None or (L.uold is None and self.params.sweeper_type == 'SDC'):
                    continue
                raw = self.estimate_embedded_error_serial(L)
                e = max(abs(raw - self.buffers.e_em_last) / divisor, np.finfo(float).eps)
                L.status.error_embedded_estimate = e
                L.status.increment = e
            if not self.params.averaged and raw is not None:
                self.buffers.e_em_last = float(raw)


class EstimateEmbeddedErrorCollocation(ConvergenceController):
    """Embedded error from switching quadrature rules: the difference between
    the converged solutions of two successive collocation problems (reference
    estimate_embedded_error.py:280-363).  Stored on the finest level as
    ``error_embedded_estimate_collocation = (iter, error)``; the switching
    itself is delegated to :class:`AdaptiveCollocation` (pass its parameters
    as ``adaptive_coll_params``)."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': 210,
            'adaptive_coll_params': {},
            **super().setup(controller, params, description, **kwargs),
        }
        self._us = []
        self._iters = []
        return defaults

    def dependencies(self, controller, description, **kwargs):
        from pysdc_tpu.convergence.adaptive_collocation import AdaptiveCollocation

        controller.add_convergence_controller(
            AdaptiveCollocation, params=dict(self.params.adaptive_coll_params), description=description
        )

    def setup_status_variables(self, controller, **kwargs):
        self.add_status_variable_to_level('error_embedded_estimate_collocation')

    def reset_status_variables(self, controller, **kwargs):
        self._us = []
        self._iters = []
        self.set_level_status_variable('error_embedded_estimate_collocation', None)

    def post_iteration_processing(self, controller, S, **kwargs):
        # runs before AdaptiveCollocation (210 < 300), so status.done still
        # marks "current collocation problem converged"
        if S.status.done:
            lvl = S.levels[0]
            lvl.compute_end_point()
            self._us.append(lvl.uend)
            self._iters.append(S.status.iter)
            if len(self._us) > 1:
                import jax.numpy as jnp

                err = float(jnp.max(jnp.abs(self._us[-1] - self._us[-2])))
                lvl.status.error_embedded_estimate_collocation = (
                    self._iters[-2],
                    max(np.finfo(float).eps, err),
                )
