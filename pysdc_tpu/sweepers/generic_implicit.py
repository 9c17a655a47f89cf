"""Generic implicit SDC sweeper.

TPU-native counterpart of the reference ``generic_implicit``
(``pySDC/implementations/sweeper_classes/generic_implicit.py:4-131``): one
sweep updates all collocation nodes with a lower-triangular (or diagonal)
QDelta preconditioner.

Structure of one sweep (mathematically identical to the reference):
  integral_m = u0 + tau_m + dt * ((Q - QI) f^k)_m            (one matmul)
  for m = 1..M:   u_m^{k+1} = solve(I - dt*qd_mm A,
                      integral_m + dt * sum_{j<m} QI_mj f_j^{k+1})

Diagonal QI (IEpar / MIN-SR-*): the inner loop disappears — all node solves
and RHS evaluations are batched into single fused calls (the reference needs
one MPI rank per node for this, generic_implicit_MPI.py:8).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import LevelState
from pysdc_tpu.core.sweeper import Sweeper, _tensordot_nodes
from pysdc_tpu.ops.qdelta import is_diagonal


class GenericImplicit(Sweeper):
    """params: num_nodes, quad_type, node_type, QI (default 'IE'), ..."""

    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QI', 'IE')
        super().__init__(params)
        self.qi_type = params['QI']
        self.QI = self.get_Qdelta_implicit(self.qi_type)
        self.parallelizable = is_diagonal(self.QI)

    def _qi(self, k: int) -> np.ndarray:
        """Sweep-k coefficients (k static; reference sweeper.py:262)."""
        if self.k_dependent and k > 0:
            return self.get_Qdelta_implicit(self.qi_type, k=k)
        return self.QI

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        QI = self._qi(k)
        ts = self.node_times(t, dt)

        # (M, *shape): any array-valued RHS — multi-component states carry a
        # leading component axis inside *shape (the reference's generic path
        # handles any mesh-like dtype the same way); problems with split
        # pytree RHS (imex/comp2) pair with their dedicated sweepers
        ft = state.f[1:]
        W = self.coll.q - QI[1:, 1:]
        integral = dt * _tensordot_nodes(W, ft) + state.u[0][None] + state.tau

        if is_diagonal(QI):
            qd = jnp.asarray(np.diag(QI)[1:], dtype=state.u.dtype)
            u_new = prob.solve_system_batched(integral, dt * qd, state.u[1:], ts)
            f_new = prob.eval_f_batched(u_new, ts)
            u = jnp.concatenate([state.u[:1], u_new], axis=0)
            f = jnp.concatenate([state.f[:1], f_new], axis=0)
            return LevelState(u=u, f=f, tau=state.tau)

        # sequential Gauss-Seidel-style sweep; M is small and static so the
        # Python loop unrolls into one XLA program
        u_list = [state.u[m] for m in range(M + 1)]
        f_list = [state.f[m] for m in range(M + 1)]
        for m in range(M):
            rhs = integral[m]
            for j in range(1, m + 1):
                if QI[m + 1, j] != 0.0:
                    # float(): numpy scalars are strong-typed in JAX and
                    # would promote float32 states to float64
                    rhs = rhs + dt * float(QI[m + 1, j]) * f_list[j]
            alpha = float(QI[m + 1, m + 1])
            if alpha == 0.0:
                u_list[m + 1] = rhs
            elif prob.accepts_node_index:
                # static node index selects the prepared factorization
                u_list[m + 1] = prob.solve_system(rhs, dt * alpha, u_list[m + 1], ts[m], node=m)
            else:
                u_list[m + 1] = prob.solve_system(rhs, dt * alpha, u_list[m + 1], ts[m])
            f_list[m + 1] = prob.eval_f(u_list[m + 1], ts[m])

        u = jnp.stack(u_list, axis=0)
        f = jnp.stack(f_list, axis=0)
        return LevelState(u=u, f=f, tau=state.tau)

    def update_nodes_k(self, prob, state: LevelState, t, dt, n_sweeps: int, k0: int = 0) -> LevelState:
        """Fused multi-sweep: when the problem advertises a diagonalizable
        operator (linear, autonomous), run all sweeps in its diagonal basis —
        one transform in, k elementwise sweeps, one transform out
        (ops/diag_sdc.py).  Falls back to looping update_nodes otherwise."""
        op = getattr(prob, 'diagonalizable_operator', None)
        if op is not None:
            from pysdc_tpu.ops.diag_sdc import diagonal_sweeps

            return diagonal_sweeps(op, self, state, t, dt, n_sweeps, k0)
        return super().update_nodes_k(prob, state, t, dt, n_sweeps, k0)
