"""First-order IMEX SDC sweeper.

TPU-native counterpart of the reference ``imex_1st_order``
(``pySDC/implementations/sweeper_classes/imex_1st_order.py:6-187``): stiff
part handled with an implicit QDelta (QI), non-stiff part with an explicit
one (QE, including the extra u0 column).  RHS values are
:class:`~pysdc_tpu.core.state.IMEX` pytrees with ``impl`` / ``expl`` leaves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import IMEX, LevelState
from pysdc_tpu.core.sweeper import Sweeper, _tensordot_nodes
from pysdc_tpu.ops.qdelta import is_diagonal


class IMEXSweeper(Sweeper):
    """params: num_nodes, quad_type, node_type, QI ('IE'), QE ('EE'), ..."""

    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QI', 'IE')
        params.setdefault('QE', 'EE')
        super().__init__(params)
        self.qi_type = params['QI']
        self.qe_type = params['QE']
        self.QI = self.get_Qdelta_implicit(self.qi_type)
        self.QE = self.get_Qdelta_explicit(self.qe_type)
        self.parallelizable = is_diagonal(self.QI) and not np.any(self.QE[1:, 1:])

    def _coeffs(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        QI, QE = self.QI, self.QE
        if self.k_dependent and k > 0:
            from pysdc_tpu.ops.qdelta import is_k_dependent

            if is_k_dependent(self.qi_type):
                QI = self.get_Qdelta_implicit(self.qi_type, k=k)
            if is_k_dependent(self.qe_type):
                QE = self.get_Qdelta_explicit(self.qe_type, k=k)
        return QI, QE

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        QI, QE = self._coeffs(k)
        ts = self.node_times(t, dt)

        fi = state.f.impl[1:]
        fe = state.f.expl[1:]
        # known part: u0 + tau + dt*(Q(fi+fe) - QI fi - QE fe); only the
        # within-node columns of QI/QE enter here — the u0 column of QE is
        # not used by the sweep (reference imex_1st_order.py:76-88)
        WI = self.coll.q - QI[1:, 1:]
        WE = self.coll.q - QE[1:, 1:]
        integral = dt * (_tensordot_nodes(WI, fi) + _tensordot_nodes(WE, fe)) + state.u[0][None] + state.tau

        if is_diagonal(QI) and not np.any(QE[1:, 1:]):
            qd = jnp.asarray(np.diag(QI)[1:], dtype=state.u.dtype)
            u_new = prob.solve_system_batched(integral, dt * qd, state.u[1:], ts)
            f_new = prob.eval_f_batched(u_new, ts)
            u = jnp.concatenate([state.u[:1], u_new], axis=0)
            f = IMEX(
                impl=jnp.concatenate([state.f.impl[:1], f_new.impl], axis=0),
                expl=jnp.concatenate([state.f.expl[:1], f_new.expl], axis=0),
            )
            return LevelState(u=u, f=f, tau=state.tau)

        u_list = [state.u[m] for m in range(M + 1)]
        fi_list = [state.f.impl[m] for m in range(M + 1)]
        fe_list = [state.f.expl[m] for m in range(M + 1)]
        for m in range(M):
            rhs = integral[m]
            for j in range(1, m + 1):
                if QI[m + 1, j] != 0.0:
                    rhs = rhs + dt * float(QI[m + 1, j]) * fi_list[j]
                if QE[m + 1, j] != 0.0:
                    rhs = rhs + dt * float(QE[m + 1, j]) * fe_list[j]
            if prob.accepts_node_index:
                u_list[m + 1] = prob.solve_system(
                    rhs, dt * float(QI[m + 1, m + 1]), u_list[m + 1], ts[m], node=m
                )
            else:
                u_list[m + 1] = prob.solve_system(rhs, dt * float(QI[m + 1, m + 1]), u_list[m + 1], ts[m])
            fm = prob.eval_f(u_list[m + 1], ts[m])
            fi_list[m + 1], fe_list[m + 1] = fm.impl, fm.expl

        u = jnp.stack(u_list, axis=0)
        f = IMEX(impl=jnp.stack(fi_list, axis=0), expl=jnp.stack(fe_list, axis=0))
        return LevelState(u=u, f=f, tau=state.tau)
