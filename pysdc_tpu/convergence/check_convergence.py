"""Stop on residual tolerance / max iterations / e_tol.

Mirrors the reference ``CheckConvergence``
(``implementations/convergence_controller_classes/check_convergence.py:6-114``)
including the Gauss-Seidel ``prev_done`` forwarding semantics handled by the
controllers.
"""

from __future__ import annotations

from pysdc_tpu.core.convergence import ConvergenceController


class CheckConvergence(ConvergenceController):
    def setup(self, controller, params, description, **kwargs):
        defaults = {'control_order': +200, 'use_e_tol': 'e_tol' in description.get('level_params', {})}
        return {**defaults, **super().setup(controller, params, description, **kwargs)}

    def dependencies(self, controller, description, **kwargs):
        super().dependencies(controller, description, **kwargs)
        if self.params.use_e_tol:
            from pysdc_tpu.convergence.estimate_embedded_error import EstimateEmbeddedError

            controller.add_convergence_controller(EstimateEmbeddedError, description=description)

    @staticmethod
    def check_convergence(S, self=None):
        """Convergence of a single step (reference check_convergence.py:59)."""
        L = S.levels[0]
        iter_converged = S.status.iter >= S.params.maxiter
        residual = float(L.status.residual) if L.status.residual is not None else None
        res_converged = (
            residual is not None
            and residual <= L.params.restol
            and (S.status.iter > 0 or L.status.sweep > 0)
        )
        increment = getattr(L.status, 'increment', None)
        e_tol_converged = (
            increment is not None and L.params.e_tol is not None and L.params.e_tol > 0 and increment < L.params.e_tol
        )
        converged = (
            iter_converged or res_converged or e_tol_converged or S.status.force_done
        ) and not S.status.force_continue
        return bool(converged)

    def check_iteration_status(self, controller, S, **kwargs):
        S.status.done = self.check_convergence(S, self)
        S.status.force_continue = False
