"""Multi-implicit SDC sweeper: two implicit components, separate solves.

Counterpart of the reference ``multi_implicit``
(``implementations/sweeper_classes/multi_implicit.py``): component 1 is
preconditioned with Q1, component 2 with Q2; each node does two implicit
solves (``solve_system_1`` then ``solve_system_2``).  RHS values are
:class:`~pysdc_tpu.core.state.Comp2` pytrees.
"""

from __future__ import annotations

import jax.numpy as jnp

from pysdc_tpu.core.state import Comp2, LevelState
from pysdc_tpu.core.sweeper import Sweeper, _tensordot_nodes


class MultiImplicitSweeper(Sweeper):
    """params: num_nodes, quad_type, Q1 ('IE'), Q2 ('IE')."""

    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('Q1', 'IE')
        params.setdefault('Q2', 'IE')
        super().__init__(params)
        self.Q1 = self.get_Qdelta_implicit(params['Q1'])
        self.Q2 = self.get_Qdelta_implicit(params['Q2'])

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        ts = self.node_times(t, dt)
        solve_1 = getattr(prob, 'solve_system_1', prob.solve_system)
        solve_2 = prob.solve_system_2

        f1 = state.f.comp1[1:]
        f2 = state.f.comp2[1:]
        # known part for the Q1 solve: u0 + tau + dt*(Q(f1+f2) - Q1 f1)
        integral = (
            dt * (_tensordot_nodes(self.coll.q - self.Q1[1:, 1:], f1) + _tensordot_nodes(self.coll.q, f2))
            + state.u[0][None]
            + state.tau
        )
        # Q2-preconditioner part of the old iterate, subtracted later
        Q2int = dt * _tensordot_nodes(self.Q2[1:, 1:], f2)

        u_list = [state.u[m] for m in range(M + 1)]
        f1_list = [state.f.comp1[m] for m in range(M + 1)]
        f2_list = [state.f.comp2[m] for m in range(M + 1)]

        for m in range(M):
            rhs = integral[m]
            for j in range(1, m + 1):
                if self.Q1[m + 1, j] != 0.0:
                    rhs = rhs + dt * float(self.Q1[m + 1, j]) * f1_list[j]
            u_mid = solve_1(rhs, dt * float(self.Q1[m + 1, m + 1]), u_list[m + 1], ts[m])

            rhs = u_mid - Q2int[m]
            for j in range(1, m + 1):
                if self.Q2[m + 1, j] != 0.0:
                    rhs = rhs + dt * float(self.Q2[m + 1, j]) * f2_list[j]
            u_list[m + 1] = solve_2(rhs, dt * float(self.Q2[m + 1, m + 1]), u_mid, ts[m])

            fm = prob.eval_f(u_list[m + 1], ts[m])
            f1_list[m + 1], f2_list[m + 1] = fm.comp1, fm.comp2

        u = jnp.stack(u_list, axis=0)
        f = Comp2(comp1=jnp.stack(f1_list, axis=0), comp2=jnp.stack(f2_list, axis=0))
        return LevelState(u=u, f=f, tau=state.tau)
