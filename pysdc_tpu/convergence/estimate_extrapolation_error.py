"""Taylor-extrapolation-based local error estimate across steps.

Mirrors the reference ``EstimateExtrapolationErrorNonMPI``
(convergence_controller_classes/estimate_extrapolation_error.py:10-393):
store (u, f) at the last node of previous steps, build finite-difference
Taylor coefficients, extrapolate to the current step end and compare.
"""

from __future__ import annotations

import numpy as np
from scipy.special import factorial

from pysdc_tpu.core.convergence import ConvergenceController
from pysdc_tpu.core.errors import ParameterError
from pysdc_tpu.core.state import f_total, norm_max


class EstimateExtrapolationErrorNonMPI(ConvergenceController):
    def __init__(self, controller, params, description, **kwargs):
        super().__init__(controller, params, description, **kwargs)
        n = self.params.n
        self.prev = {'t': np.array([None] * n), 'dt': np.array([None] * n), 'u': [None] * n, 'f': [None] * n}
        self.coeff = {'u': [None] * n, 'f': [0.0] * n, 'prefactor': None}
        from pysdc_tpu.hooks.logging_hooks import LogEmbeddedErrorEstimate  # placeholder hook import

    def setup(self, controller, params, description, **kwargs):
        from pysdc_tpu.convergence.adaptivity import Adaptivity
        from pysdc_tpu.convergence.hotrod import HotRod

        defaults = {
            'control_order': -75,
            'use_adaptivity': any(me == Adaptivity for me in description.get('convergence_controllers', {})),
            'use_HotRod': any(me == HotRod for me in description.get('convergence_controllers', {})),
            'order_time_marching': description['step_params']['maxiter'],
            'no_storage': False,
        }
        new = {**defaults, **super().setup(controller, params, description, **kwargs)}
        new['Taylor_order'] = new['order_time_marching'] + 2
        new['estimate_iter'] = new['order_time_marching'] - (1 if new['use_HotRod'] else 0)
        new['n'] = (new['Taylor_order'] + 1) // 2

        if description['level_params'].get('restol', -1.0) >= 0:
            raise ParameterError('Extrapolation error estimate needs restol < 0 (constant order in time)')
        return new

    def setup_status_variables(self, controller, **kwargs):
        self.add_status_variable_to_level('error_extrapolation_estimate')

    def store_values(self, S):
        """Keep (t, dt, u, f) of the step end (reference :118-151)."""
        if None in self.prev['t']:
            oldest = int(np.sum(self.prev['t'] != None))  # noqa: E711
        else:
            oldest = int(np.argmin(self.prev['t']))
        L = S.levels[0]
        self.prev['f'][oldest] = f_total(L.state.f)[-1]
        self.prev['u'][oldest] = L.state.u[-1]
        self.prev['t'][oldest] = float(S.time) + float(S.dt)
        self.prev['dt'][oldest] = float(S.dt)

    def get_extrapolation_coefficients(self, t, dt, t_eval):
        """Solve the dense Taylor system for u/f combination weights
        (reference :152-224)."""
        K = self.params.Taylor_order
        n = self.params.n
        A = np.zeros((K, K))
        A[0, :n] = 1.0
        j = np.arange(K)
        inv_facs = 1.0 / factorial(j)
        idx = np.argsort(t)
        steps_from_now = np.asarray(t, dtype=float)[idx] - t_eval
        for i in range(1, K):
            A[i, :n] = steps_from_now ** j[i] * inv_facs[i]
            A[i, n:K] = steps_from_now[2 * n - K :] ** (j[i] - 1) * inv_facs[i - 1]
        b = np.zeros(K)
        b[0] = 1.0
        coeff = np.linalg.solve(A, b)
        self.coeff['u'] = coeff[:n]
        self.coeff['f'][n * 2 - K :] = coeff[n:K]

        dt_arr = np.asarray(dt, dtype=float)
        step_size_ratios = np.abs(dt_arr[len(dt_arr) - len(self.coeff['u']) :] / dt_arr[-1]) ** (K - 1)
        inv_prefactor = -sum(step_size_ratios[1:]) - 1.0
        for i in range(len(self.coeff['u'])):
            inv_prefactor += sum(step_size_ratios[1 : i + 1]) * self.coeff['u'][i]
        self.coeff['prefactor'] = 1.0 / abs(inv_prefactor)

    def get_extrapolated_solution(self, S):
        L = S.levels[0]
        u_ex = L.state.u[-1] * 0.0
        ts = np.asarray(self.prev['t'], dtype=float)
        idx = np.argsort(ts)
        if (np.abs(float(S.time) + float(S.dt) - ts) < 10 * np.finfo(float).eps).any():
            idx_step = idx[int(np.argmin(np.abs(ts - float(S.time) - float(S.dt))))]
        else:
            idx_step = int(max(idx)) + 1
        mask = np.logical_and(idx < idx_step, idx >= idx_step - self.params.n)
        for i in range(self.params.n):
            u_ex = u_ex + self.coeff['u'][i] * self.prev['u'][idx[mask][i]] + self.coeff['f'][i] * self.prev['f'][idx[mask][i]]
        return u_ex

    def post_iteration_processing(self, controller, S, **kwargs):
        if S.status.iter == self.params.estimate_iter:
            t_eval = float(S.time) + float(S.dt)
            if (
                (None in self.coeff['u'] or self.params.use_adaptivity or (not self.params.no_storage and S.status.time_size > 1))
                and None not in self.prev['t']
                and t_eval > max(self.prev['t'])
            ):
                self.get_extrapolation_coefficients(self.prev['t'], self.prev['dt'], t_eval)
            if None not in self.coeff['u'] and None not in self.prev['t']:
                u_ex = self.get_extrapolated_solution(S)
                S.levels[0].status.error_extrapolation_estimate = (
                    float(norm_max(u_ex - S.levels[0].state.u[-1])) * self.coeff['prefactor']
                )
            if self.params.no_storage:
                self.store_values(S)

    def prepare_next_block(self, controller, S, size, time, Tend, MS=None, **kwargs):
        if self.params.no_storage:
            n = self.params.n
            self.prev = {'t': np.array([None] * n), 'dt': np.array([None] * n), 'u': [None] * n, 'f': [None] * n}
        else:
            restarts = [me.status.restart for me in MS]
            restart_at = np.where(restarts)[0][0] if True in restarts else len(MS)
            if restart_at > S.status.slot:
                self.store_values(S)
