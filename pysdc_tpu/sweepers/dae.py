"""Fully-implicit and semi-implicit SDC sweepers for DAEs F(u, u', t) = 0.

Counterparts of the reference DAE project sweepers
(projects/DAE/sweepers/fullyImplicitDAE.py, semiImplicitDAE.py, built on
Huang, Jia & Minion 2007): the unknowns at the nodes are the *derivatives*
U' (stored in the level's ``f`` slot); each node solves

    0 = F(u_approx + dt*qd_mm * U'_m, U'_m, tau_m)

with u_approx accumulating the preconditioned integral, and the solution is
recovered as u = u0 + dt Q U'.  The residual is ||F(u, u')|| at the nodes.
Node solves use a traced Newton on the flattened system (jacfwd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import LevelState, norm_max
from pysdc_tpu.core.sweeper import Sweeper, _tensordot_nodes
from pysdc_tpu.core.errors import ParameterError


class FullyImplicitDAE(Sweeper):
    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QI', 'IE')
        params.setdefault('initial_guess', 'spread')
        super().__init__(params)
        if self.coll.left_is_node:
            raise ParameterError(
                f"Quadrature type {params.get('quad_type')} is not implemented yet. Use 'RADAU-RIGHT' instead!"
            )
        self.QI = self.get_Qdelta_implicit(params['QI'])

    def predict(self, prob, u0, t, dt, random_val: float = 0.0) -> LevelState:
        """Spread u0; derivatives start at zero (reference :107-140)."""
        M = self.coll.num_nodes
        u = jnp.broadcast_to(u0, (M + 1,) + u0.shape)
        f = jnp.zeros_like(u)
        tau = jnp.zeros((M,) + u0.shape, u0.dtype)
        return LevelState(u=u, f=f, tau=tau)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        ts = self.node_times(t, dt)
        du = state.f[1:]
        W = self.coll.q - self.QI[1:, 1:]
        integral = dt * _tensordot_nodes(W, du) + state.u[0][None] + state.tau

        du_list = [state.f[m] for m in range(M + 1)]
        for m in range(M):
            u_approx = integral[m]
            for j in range(1, m + 1):
                if self.QI[m + 1, j] != 0.0:
                    u_approx = u_approx + dt * float(self.QI[m + 1, j]) * du_list[j]
            du_list[m + 1] = prob.solve_system_dae(u_approx, dt * float(self.QI[m + 1, m + 1]), du_list[m + 1], ts[m])

        f = jnp.stack(du_list, axis=0)
        u_nodes = state.u[0][None] + dt * _tensordot_nodes(self.coll.q, f[1:])
        u = jnp.concatenate([state.u[:1], u_nodes], axis=0)
        return LevelState(u=u, f=f, tau=state.tau)

    def compute_residual(self, state: LevelState, dt, residual_type: str = 'full_abs', prob=None, t=0.0):
        """||F(u_m, u'_m, tau_m)|| over the nodes (reference :142-191)."""
        prob = prob if prob is not None else self.level.prob
        ts = jnp.asarray(self.coll.nodes)
        res_nodes = jax.vmap(lambda u, du, tau_m: prob.eval_f(u, du, t + dt * tau_m))(
            state.u[1:], state.f[1:], ts
        )
        node_norms = jnp.stack([norm_max(res_nodes[m]) for m in range(self.coll.num_nodes)])
        if residual_type == 'full_abs':
            norm = jnp.max(node_norms)
        elif residual_type == 'last_abs':
            norm = node_norms[-1]
        elif residual_type == 'full_rel':
            norm = jnp.max(node_norms) / norm_max(state.u[0])
        else:
            norm = node_norms[-1] / norm_max(state.u[0])
        return res_nodes, norm

    def compute_end_point(self, state: LevelState, t, dt):
        if not self.coll.right_is_node or self.do_coll_update:
            raise NotImplementedError()
        return state.u[-1]


class RungeKuttaDAE:
    """Runge-Kutta methods for fully-implicit DAEs ``0 = F(u, u', t)``
    (reference ``projects/DAE/sweepers/rungeKuttaDAE.py:11-183``).

    The stage unknowns are the derivatives ``U_m``; each stage solves

        0 = F(u0 + dt*sum_{j<=m} a_mj U_j, U_m, t + c_m dt)

    by the problem's DAE Newton (``solve_system_dae``), and the node values
    are recovered as ``u = u0 + dt A U``.  Mixed into a concrete
    :class:`~pysdc_tpu.sweepers.runge_kutta.RungeKutta` tableau class (see
    the *DAE classes below), exactly as the reference composes
    ``RungeKuttaDAE`` with its tableau classes.

    Like the reference, the step's initial derivative ``f[0]`` is carried on
    the sweeper across steps (``du_init = U_M`` of the previous step; the
    first step uses ``prob.du_exact(t0)``) — host state, so the sweeper is
    ``host_stateful`` like the multistep family and level kernels stay
    unjitted at the top (inner Newton solves still trace/jit internally).
    """

    #: carried initial derivative (reference rungeKuttaDAE.py:84-104)
    host_stateful = True

    def __init__(self, params: dict):
        super().__init__(params)
        self.du_init = None

    def predict(self, prob, u0, t, dt, random_val: float = 0.0) -> LevelState:
        M = self.coll.num_nodes
        if self.du_init is None:
            self.du_init = jnp.asarray(prob.du_exact(float(t)), u0.dtype)
        du0 = self.du_init
        u = jnp.concatenate([u0[None], jnp.zeros((M,) + u0.shape, u0.dtype)], axis=0)
        f = jnp.concatenate([du0[None], jnp.zeros((M,) + u0.shape, u0.dtype)], axis=0)
        tau = jnp.zeros((M,) + u0.shape, u0.dtype)
        return LevelState(u=u, f=f, tau=tau)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        du_list = [state.f[m] for m in range(M + 1)]
        for m in range(M):
            u_approx = state.u[0]
            for j in range(1, m + 1):
                if self.QI[m + 1, j] != 0.0:
                    u_approx = u_approx + dt * float(self.QI[m + 1, j]) * du_list[j]
            # stage guess: the previous stage's derivative (reference :148)
            du_list[m + 1] = prob.solve_system_dae(
                u_approx, dt * float(self.QI[m + 1, m + 1]), du_list[m],
                t + dt * float(self.coll.nodes[m + 1]),
            )
        f = jnp.stack(du_list, axis=0)
        u_nodes = state.u[0][None] + dt * _tensordot_nodes(self.coll.q, f[1:])
        u = jnp.concatenate([state.u[:1], u_nodes], axis=0)
        self.du_init = f[-1]  # concrete (host_stateful: no jit at this layer)
        return LevelState(u=u, f=f, tau=state.tau)

    def compute_residual(self, state: LevelState, dt, residual_type: str = 'full_abs', prob=None, t=0.0):
        return FullyImplicitDAE.compute_residual(self, state, dt, residual_type, prob, t)

    def compute_end_point(self, state: LevelState, t, dt):
        """u0 + dt * b @ U (u[-1] when stiffly accurate) — the base RK
        endpoint already contracts the weights against f = U."""
        return super().compute_end_point(state, t, dt)


def _make_rk_dae(name, tableau_cls):
    from pysdc_tpu.sweepers import runge_kutta as rk

    cls = type(name, (RungeKuttaDAE, getattr(rk, tableau_cls)), {})
    cls.__doc__ = f"{tableau_cls} applied to 0 = F(u, u', t) (reference rungeKuttaDAE.py:170-183)."
    return cls


class SemiImplicitDAE(FullyImplicitDAE):
    """Semi-explicit DAEs: differential variables integrated, algebraic
    variables solved directly (reference semiImplicitDAE.py).  The problem
    declares ``diff_nvars`` (leading components are differential); only the
    differential derivatives are integrated with Q."""

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        nd = prob.diff_nvars
        ts = self.node_times(t, dt)
        du = state.f[1:]
        W = self.coll.q - self.QI[1:, 1:]
        integral = dt * _tensordot_nodes(W, du.at[:, nd:].set(0.0)) + state.u[0][None] + state.tau

        du_list = [state.f[m] for m in range(M + 1)]
        u_list = [state.u[m] for m in range(M + 1)]
        for m in range(M):
            u_approx = integral[m]
            for j in range(1, m + 1):
                if self.QI[m + 1, j] != 0.0:
                    u_approx = u_approx + dt * float(self.QI[m + 1, j]) * du_list[j].at[nd:].set(0.0)
            du_list[m + 1] = prob.solve_system_dae_semi(u_approx, dt * float(self.QI[m + 1, m + 1]), du_list[m + 1], ts[m])

        f = jnp.stack(du_list, axis=0)
        # differential components integrate; algebraic ones come from the solve
        u_nodes = state.u[0][None] + dt * _tensordot_nodes(self.coll.q, f[1:].at[:, nd:].set(0.0))
        u_nodes = u_nodes.at[:, nd:].set(f[1:, nd:])
        u = jnp.concatenate([state.u[:1], u_nodes], axis=0)
        return LevelState(u=u, f=f, tau=state.tau)


BackwardEulerDAE = _make_rk_dae('BackwardEulerDAE', 'BackwardEuler')
TrapezoidalRuleDAE = _make_rk_dae('TrapezoidalRuleDAE', 'CrankNicolson')
DIRK43_2DAE = _make_rk_dae('DIRK43_2DAE', 'DIRK43_2')
EDIRK4DAE = _make_rk_dae('EDIRK4DAE', 'EDIRK4')
