"""Power-electronics problems with discontinuous right-hand sides.

Counterparts of the reference ``Battery.py`` (battery / battery_implicit /
battery_n_capacitors), ``Piline.py`` and ``BuckConverter.py``
(implementations/problem_classes): piecewise-linear circuit ODEs whose
regime switches either on state thresholds (battery: capacitor voltage
crossing V_ref -> detected by the SwitchEstimator) or on time (buck
converter duty cycle).  Regime selection is data-dependent, so it is
expressed with ``jnp.where`` — both regimes are tiny linear systems and the
select stays inside one XLA program.  The event time ``t_switch`` reaches
the jitted kernels as a traced override (see Level._traced_keys).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX


class Battery(Problem):
    """Battery drain model, one capacitor: u = [i_L, v_C]
    (reference Battery.py:303-430).  IMEX split like the reference."""

    f_kind = 'imex'

    def __init__(self, Vs=5.0, Rs=0.5, C=1.0, R=1.0, L=1.0, alpha=1.2, V_ref=1.0, dtype=None):
        super().__init__(shape=(2,), dtype=dtype)
        C_arr = np.atleast_1d(C)
        V_arr = np.atleast_1d(V_ref)
        self._register(Vs=Vs, Rs=Rs, C=C_arr, R=R, L=L, alpha=alpha, V_ref=V_arr,
                       t_switch=np.inf, nswitches=0)
        self.work_counters['rhs'] = WorkCounter()

    def _regime(self, vC, t):
        """True once the capacitor is drained (switched to the source)."""
        return jnp.logical_or(vC - self.V_ref[0] <= 0, t >= self.t_switch)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        switched = self._regime(u[1], t)
        # regime 1 (capacitor): dvC/dt = -vC/(C R); regime 2: diL/dt = -(Rs+R)/L iL + Vs/L
        impl = jnp.where(
            switched,
            jnp.stack([-(self.Rs + self.R) / self.L * u[0], 0.0 * u[1]]),
            jnp.stack([0.0 * u[0], -1.0 / (self.C[0] * self.R) * u[1]]),
        )
        expl = jnp.where(switched, jnp.stack([self.Vs / self.L, 0.0]), jnp.zeros(2))
        return IMEX(impl=impl, expl=expl.astype(u.dtype))

    def solve_system(self, rhs, factor, u0, t):
        switched = self._regime(rhs[1], t)
        a00 = jnp.where(switched, -(self.Rs + self.R) / self.L, 0.0)
        a11 = jnp.where(switched, 0.0, -1.0 / (self.C[0] * self.R))
        return jnp.stack([rhs[0] / (1 - factor * a00), rhs[1] / (1 - factor * a11)])

    def u_exact(self, t, u_init=None, t_init=None):
        assert float(t) == 0, 'u_exact only valid for t=0'
        return jnp.asarray([0.0, self.alpha * self.V_ref[0]], self.dtype)

    # -- event interface (reference Battery.py:236-287) ------------------
    def get_switching_info(self, u_nodes, t):
        """u_nodes: list/array of node values.  Returns (switch_detected,
        m_guess, state_function values at the nodes)."""
        u_nodes = [np.asarray(u) for u in u_nodes]
        switch_detected, m_guess = False, -100
        for m in range(1, len(u_nodes)):
            h_prev = u_nodes[m - 1][1] - self.V_ref[0]
            h_curr = u_nodes[m][1] - self.V_ref[0]
            if h_prev > 0 and h_curr <= 0:
                switch_detected = True
                m_guess = m - 1
                break
        state_function = [float(u[1] - self.V_ref[0]) for u in u_nodes]
        return switch_detected, m_guess, state_function

    def count_switches(self):
        self.nswitches += 1


class Piline(Problem):
    """Pi-line RLC model, u = [v_C1, v_C2, i_Lp] (reference Piline.py):
    a plain linear system — useful as the smooth power-electronics baseline."""

    f_kind = 'imex'

    def __init__(self, Vs=100.0, Rs=1.0, C1=1.0, Rpi=0.2, C2=1.0, Lpi=1.0, Rl=5.0, dtype=None):
        super().__init__(shape=(3,), dtype=dtype)
        self._register(Vs=Vs, Rs=Rs, C1=C1, Rpi=Rpi, C2=C2, Lpi=Lpi, Rl=Rl)
        A = np.array(
            [
                [-1 / (Rs * C1), 0.0, -1 / C1],
                [0.0, -1 / (Rl * C2), 1 / C2],
                [1 / Lpi, -1 / Lpi, -Rpi / Lpi],
            ]
        )
        self.A = jnp.asarray(A)
        self._Ainv_cache = np.array(A)
        self.work_counters['rhs'] = WorkCounter()

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        expl = jnp.zeros(3, u.dtype).at[0].set(self.Vs / (self.Rs * self.C1))
        return IMEX(impl=self.A @ u, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        M = jnp.eye(3, dtype=rhs.dtype) - factor * self.A.astype(rhs.dtype)
        return jnp.linalg.solve(M, rhs)

    def u_exact(self, t, u_init=None, t_init=0.0):
        """Steady state for t -> inf; initial condition at t=0
        (reference uses [0, 0, 0] start)."""
        if float(t) == 0.0:
            return jnp.zeros(3, self.dtype)
        raise NotImplementedError('only the t=0 initial condition is provided')


class BuckConverter(Problem):
    """Buck (step-down) converter with time-based duty cycling
    (reference BuckConverter.py): switching between charging/discharging
    regimes at fixed fractions of the duty cycle period."""

    f_kind = 'imex'

    def __init__(self, duty=0.5, fsw=1e3, Vs=10.0, Rs=0.5, C1=1e-3, Rp=0.01, L1=1e-3,
                 C2=1e-3, Rl=10.0, dtype=None):
        super().__init__(shape=(3,), dtype=dtype)
        self._register(duty=duty, fsw=fsw, Vs=Vs, Rs=Rs, C1=C1, Rp=Rp, L1=L1, C2=C2, Rl=Rl)
        # closed-switch system matrix (source connected)
        A1 = np.array(
            [
                [-1 / (Rs * C1), 0.0, -1 / C1],
                [0.0, -1 / (Rl * C2), 1 / C2],
                [1 / L1, -1 / L1, 0.0],
            ]
        )
        # open-switch matrix (freewheeling diode)
        A2 = np.array(
            [
                [-1 / (Rs * C1), 0.0, 0.0],
                [0.0, -1 / (Rl * C2), 1 / C2],
                [0.0, -1 / L1, 0.0],
            ]
        )
        self.A1, self.A2 = jnp.asarray(A1), jnp.asarray(A2)
        self.work_counters['rhs'] = WorkCounter()

    def _closed(self, t):
        Tsw = 1.0 / self.fsw
        return jnp.mod(t, Tsw) <= self.duty * Tsw

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        closed = self._closed(t)
        A = jnp.where(closed, self.A1, self.A2)
        expl = jnp.zeros(3, u.dtype).at[0].set(self.Vs / (self.Rs * self.C1))
        return IMEX(impl=(A @ u).astype(u.dtype), expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        A = jnp.where(self._closed(t), self.A1, self.A2).astype(rhs.dtype)
        return jnp.linalg.solve(jnp.eye(3, dtype=rhs.dtype) - factor * A, rhs)

    def u_exact(self, t, u_init=None, t_init=None):
        assert float(t) == 0
        return jnp.zeros(3, self.dtype)


class BatteryNCapacitors(Problem):
    """Battery drain with N capacitors (reference Battery.py:8-301):
    u = [i_L, v_C1..v_CN]; each capacitor discharges until its voltage hits
    V_ref, then the next one (finally the source) takes over."""

    f_kind = 'imex'

    def __init__(self, ncapacitors=2, Vs=5.0, Rs=0.5, C=None, R=1.0, L=1.0, alpha=1.2,
                 V_ref=None, dtype=None):
        n = ncapacitors
        super().__init__(shape=(n + 1,), dtype=dtype)
        C_arr = np.ones(n) if C is None else np.atleast_1d(C)
        V_arr = np.ones(n) if V_ref is None else np.atleast_1d(V_ref)
        self._register(ncapacitors=n, Vs=Vs, Rs=Rs, C=C_arr, R=R, L=L, alpha=alpha,
                       V_ref=V_arr, t_switch=np.inf, nswitches=0)
        # per-regime system matrices (reference get_problem_dict)
        v = np.zeros(n + 1)
        v[0] = 1
        A_list, b_list = [], []
        for k in range(n):
            A_list.append(np.diag(-1 / (C_arr[k] * R) * np.roll(v, k + 1)))
            b_list.append(np.zeros(n + 1))
        A_list.append(np.diag(-(Rs + R) / L * v))
        b_list.append(Vs / L * v)
        self.A_all = jnp.asarray(np.stack(A_list))
        self.b_all = jnp.asarray(np.stack(b_list))
        self.work_counters['rhs'] = WorkCounter()

    def _regime_index(self, u):
        """Number of drained capacitors = index of the active regime."""
        drained = (u[1:] - jnp.asarray(self.V_ref)) <= 0
        return jnp.sum(drained.astype(jnp.int32))

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        k = self._regime_index(u)
        A = self.A_all[k]
        b = self.b_all[k]
        return IMEX(impl=(A @ u).astype(u.dtype), expl=b.astype(u.dtype))

    def solve_system(self, rhs, factor, u0, t):
        k = self._regime_index(rhs)
        A = self.A_all[k].astype(rhs.dtype)
        n = self.ncapacitors + 1
        return jnp.linalg.solve(jnp.eye(n, dtype=rhs.dtype) - factor * A, rhs)

    def u_exact(self, t, u_init=None, t_init=None):
        assert float(t) == 0
        u = np.zeros(self.ncapacitors + 1)
        u[1:] = self.alpha * np.asarray(self.V_ref)
        return jnp.asarray(u, self.dtype)

    def get_switching_info(self, u_nodes, t):
        u_nodes = [np.asarray(u) for u in u_nodes]
        switch_detected, m_guess, k_detected = False, -100, 1
        for m in range(1, len(u_nodes)):
            for k in range(1, self.ncapacitors + 1):
                h_prev = u_nodes[m - 1][k] - self.V_ref[k - 1]
                h_curr = u_nodes[m][k] - self.V_ref[k - 1]
                if h_prev > 0 and h_curr <= 0:
                    switch_detected, m_guess, k_detected = True, m - 1, k
                    break
            if switch_detected:
                break
        state_function = [float(u[k_detected] - self.V_ref[k_detected - 1]) for u in u_nodes]
        return switch_detected, m_guess, state_function

    def count_switches(self):
        self.nswitches += 1
