"""Adaptive step-size selection from local error estimates.

Mirrors the reference adaptivity family
(convergence_controller_classes/adaptivity.py): optimal step size
``dt_new = beta * dt * (e_tol / e_est)^(1/order)``, restart when the local
error exceeds ``e_tol`` after the final iteration.
"""

from __future__ import annotations

import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController
from pysdc_tpu.core.errors import ParameterError


class AdaptivityBase(ConvergenceController):
    """Base: optimal-step-size formula + restart policy (adaptivity.py:8)."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {'control_order': -50, 'beta': 0.9}
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def dependencies(self, controller, description, **kwargs):
        limiter_keys = ['dt_min', 'dt_max', 'dt_slope_min', 'dt_slope_max', 'dt_rel_min_slope']
        available = {k: getattr(self.params, k) for k in limiter_keys if hasattr(self.params, k)}
        if available:
            from pysdc_tpu.convergence.step_size_limiter import StepSizeLimiter

            controller.add_convergence_controller(StepSizeLimiter, params=available, description=description)

    def compute_optimal_step_size(self, beta, dt, e_tol, e_est, order):
        return beta * dt * (e_tol / e_est) ** (1.0 / order)

    def get_local_error_estimate(self, controller, S, **kwargs):
        raise NotImplementedError('Please implement a way to get the local error')

    def determine_restart(self, controller, S, **kwargs):
        if S.status.iter >= S.params.maxiter:
            e_est = self.get_local_error_estimate(controller, S)
            if e_est >= self.params.e_tol:
                S.status.restart = True
                self.log(f'Restarting: e={e_est:.2e} >= e_tol={self.params.e_tol:.2e}', S)


class Adaptivity(AdaptivityBase):
    """Embedded-error-based adaptivity (adaptivity.py:273)."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {'embedded_error_flavor': 'standard', 'rel_error': False}
        params = {**defaults, **super().setup(controller, params, description, **kwargs)}
        if description.get('level_params', {}).get('restol', -1.0) >= 0:
            raise ParameterError(
                'Adaptivity needs constant order in time: restol must be < 0 (use maxiter instead)'
            )
        if 'e_tol' not in params:
            raise ParameterError('Adaptivity needs a local tolerance: pass e_tol in its params')
        return params

    def dependencies(self, controller, description, **kwargs):
        from pysdc_tpu.convergence.estimate_embedded_error import EstimateEmbeddedError

        super().dependencies(controller, description, **kwargs)
        impl = EstimateEmbeddedError.get_implementation(self.params.embedded_error_flavor)
        controller.add_convergence_controller(
            impl, description=description, params={'rel_error': self.params.rel_error}
        )

    def get_new_step_size(self, controller, S, **kwargs):
        if S.status.iter == S.params.maxiter:
            L = S.levels[0]
            order = S.status.iter  # embedded estimate order == iteration count
            e_est = self.get_local_error_estimate(controller, S)
            L.status.dt_new = self.compute_optimal_step_size(
                self.params.beta, L.params.dt, self.params.e_tol, e_est, order
            )
            self.log(f'Adjusting step size from {L.params.dt:.2e} to {L.status.dt_new:.2e}', S)

    def get_local_error_estimate(self, controller, S, **kwargs):
        return S.levels[0].status.error_embedded_estimate


class AdaptivityRK(Adaptivity):
    """Adaptivity for embedded RK pairs: fixed update order (adaptivity.py:422)."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {}
        defaults['update_order'] = params.get('update_order', description['sweeper_class'].get_update_order())
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def get_new_step_size(self, controller, S, **kwargs):
        if S.status.iter == S.params.maxiter:
            L = S.levels[0]
            e_est = self.get_local_error_estimate(controller, S)
            L.status.dt_new = self.compute_optimal_step_size(
                self.params.beta, L.params.dt, self.params.e_tol, e_est, self.params.update_order
            )
            self.log(f'Adjusting step size from {L.params.dt:.2e} to {L.status.dt_new:.2e}', S)


class AdaptivityResidual(AdaptivityBase):
    """Residual-based step size control (adaptivity.py:458): double/halve the
    step size when the residual leaves [e_tol, max_restol]."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': -45,
            'e_tol': np.inf,
            'max_restol': 0,
            'allowed_modifications': ['increase', 'decrease'],
        }
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def dependencies(self, controller, description, **kwargs):
        pass

    def setup_status_variables(self, controller, **kwargs):
        pass

    def get_new_step_size(self, controller, S, **kwargs):
        if S.status.iter == S.params.maxiter:
            L = S.levels[0]
            res = self.get_local_error_estimate(controller, S)
            dt_planned = L.status.dt_new if L.status.dt_new is not None else L.params.dt
            if res > self.params.e_tol and 'decrease' in self.params.allowed_modifications:
                L.status.dt_new = min([dt_planned, L.params.dt / 2.0])
                self.log(f'Halving step size from {L.params.dt:.2e} to {L.status.dt_new:.2e}', S)
            elif res < self.params.max_restol and 'increase' in self.params.allowed_modifications:
                L.status.dt_new = max([dt_planned, L.params.dt * 2.0])
                self.log(f'Doubling step size from {L.params.dt:.2e} to {L.status.dt_new:.2e}', S)

    def get_local_error_estimate(self, controller, S, **kwargs):
        return float(S.levels[0].status.residual)

    def determine_restart(self, controller, S, **kwargs):
        if S.status.iter >= S.params.maxiter:
            res = self.get_local_error_estimate(controller, S)
            if res > self.params.e_tol:
                S.status.restart = True
                self.log(f'Restarting: residual={res:.2e} > e_tol={self.params.e_tol:.2e}', S)


class AdaptivityPolynomialError(AdaptivityBase):
    """Adaptivity from the polynomial (left-out-node) error estimate of the
    *converged* collocation problem (reference adaptivity.py:831): iterate
    to restol, then pick dt from the order-M estimate.  This is the
    reference's recommended adaptivity for SDC with residual-based stopping.
    """

    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': -50,
            'e_tol': params.get('e_tol'),
            'restol_rel': params.get('restol_rel', 1e-4),
            'restol_min': params.get('restol_min', 1e-12),
            'interpolate_between_restarts': False,
        }
        out = {**defaults, **super().setup(controller, params, description, **kwargs)}
        if out['e_tol'] is None:
            raise ParameterError('AdaptivityPolynomialError needs e_tol')
        return out

    def dependencies(self, controller, description, **kwargs):
        from pysdc_tpu.convergence.estimate_polynomial_error import EstimatePolynomialError

        super().dependencies(controller, description, **kwargs)
        controller.add_convergence_controller(EstimatePolynomialError, description=description)

    def get_new_step_size(self, controller, S, **kwargs):
        from pysdc_tpu.convergence.check_convergence import CheckConvergence

        if not CheckConvergence.check_convergence(S):
            return
        L = S.levels[0]
        e_est = getattr(L.status, 'error_embedded_estimate', None)
        order = getattr(L.status, 'order_embedded_estimate', None)
        if e_est is None or order is None:
            return
        L.status.dt_new = self.compute_optimal_step_size(
            self.params.beta, L.params.dt, self.params.e_tol, e_est, order
        )
        # link the residual tolerance to the error target (inexactness)
        L.params.restol = max(self.params.restol_rel * self.params.e_tol, self.params.restol_min)
        self.log(f'Adjusting step size from {L.params.dt:.2e} to {L.status.dt_new:.2e}', S)

    def get_local_error_estimate(self, controller, S, **kwargs):
        est = getattr(S.levels[0].status, 'error_embedded_estimate', None)
        return est if est is not None else 0.0

    def determine_restart(self, controller, S, **kwargs):
        """Restart once the *converged* step's estimate exceeds e_tol
        (reference AdaptivityForConvergedCollocationProblems:228)."""
        from pysdc_tpu.convergence.check_convergence import CheckConvergence

        if CheckConvergence.check_convergence(S):
            e_est = self.get_local_error_estimate(controller, S)
            if e_est >= self.params.e_tol:
                S.status.restart = True
                self.log(f'Restarting: e={e_est:.2e} >= e_tol={self.params.e_tol:.2e}', S)


class AdaptivityCollocation(AdaptivityBase):
    """Step size control from the collocation-based embedded error estimate
    (reference adaptivity.py:587-700): the difference between converged
    solutions of successive quadrature rules gives a local error of order
    min(order_1, order_2) + 1; step size and restarts follow the usual
    optimal-step-size rule once the *last* collocation problem converges."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'adaptive_coll_params': {},
            'restart_at_maxiter': True,
            **super().setup(controller, params, description, **kwargs),
            'control_order': 220,
        }
        if 'e_tol' not in defaults:
            from pysdc_tpu.core.errors import ParameterError

            raise ParameterError('AdaptivityCollocation needs an e_tol')
        self.num_colls = 0
        for key, val in defaults['adaptive_coll_params'].items():
            if isinstance(val, list):
                self.num_colls = max(self.num_colls, len(val))
        self._errors = []
        self._orders = []
        return defaults

    def dependencies(self, controller, description, **kwargs):
        from pysdc_tpu.convergence.estimate_embedded_error import EstimateEmbeddedErrorCollocation

        super().dependencies(controller, description, **kwargs)
        controller.add_convergence_controller(
            EstimateEmbeddedErrorCollocation,
            params={'adaptive_coll_params': self.params.adaptive_coll_params},
            description=description,
        )

    def reset_status_variables(self, controller, **kwargs):
        self._errors = []
        self._orders = []

    def get_convergence(self, controller, S, **kwargs):
        return len(self._orders) == self.num_colls

    def get_local_error_estimate(self, controller, S, **kwargs):
        if len(self._errors) > 1 and self._errors[-1] is not None:
            return self._errors[-1][1]
        return 0.0

    def post_iteration_processing(self, controller, S, **kwargs):
        if S.status.done:
            lvl = S.levels[0]
            self._errors.append(lvl.status.error_embedded_estimate_collocation)
            self._orders.append(lvl.sweep.coll.order)

    def get_new_step_size(self, controller, S, **kwargs):
        if self.get_convergence(controller, S):
            lvl = S.levels[0]
            order = min(self._orders[-2:]) + 1
            e_est = self.get_local_error_estimate(controller, S)
            if e_est > 0:
                lvl.status.dt_new = self.compute_optimal_step_size(
                    self.params.beta, lvl.params.dt, self.params.e_tol, e_est, order
                )
                self.log(f'Adjusting step size from {lvl.params.dt:.2e} to {lvl.status.dt_new:.2e}', S)

    def determine_restart(self, controller, S, **kwargs):
        if self.get_convergence(controller, S):
            e_est = self.get_local_error_estimate(controller, S)
            if e_est >= self.params.e_tol:
                S.status.restart = True
                self.log(f'Restarting: e={e_est:.2e} >= e_tol={self.params.e_tol:.2e}', S)
