"""Explicit SDC sweeper (forward-Euler-type preconditioner).

TPU-native counterpart of the reference ``explicit``
(``pySDC/implementations/sweeper_classes/explicit.py``).  The sweep is fully
explicit: no solves, all new RHS values enter through the strictly-lower
triangular QE (including its u0 column).
"""

from __future__ import annotations

import jax.numpy as jnp

from pysdc_tpu.core.state import LevelState
from pysdc_tpu.core.sweeper import Sweeper, _tensordot_nodes


class ExplicitSweeper(Sweeper):
    """params: num_nodes, quad_type, node_type, QE (default 'EE')."""

    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QE', 'EE')
        super().__init__(params)
        self.qe_type = params['QE']
        self.QE = self.get_Qdelta_explicit(self.qe_type)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        QE = self.QE
        ts = self.node_times(t, dt)

        ft = state.f[1:]
        W = self.coll.q - QE[1:, 1:]
        integral = dt * _tensordot_nodes(W, ft) + state.u[0][None] + state.tau

        u_list = [state.u[m] for m in range(M + 1)]
        f_list = [state.f[m] for m in range(M + 1)]
        for m in range(M):
            rhs = integral[m]
            for j in range(1, m + 1):
                if QE[m + 1, j] != 0.0:
                    rhs = rhs + dt * float(QE[m + 1, j]) * f_list[j]
            u_list[m + 1] = rhs
            f_list[m + 1] = prob.eval_f(u_list[m + 1], ts[m])

        return LevelState(u=jnp.stack(u_list, 0), f=jnp.stack(f_list, 0), tau=state.tau)
