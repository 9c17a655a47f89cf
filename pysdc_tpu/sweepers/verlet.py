"""Velocity-Verlet SDC sweeper for second-order problems.

Counterpart of the reference ``verlet``
(``implementations/sweeper_classes/verlet.py:6-207``): position/velocity
updates with the QQ (second-order collocation), QT (trapezoidal) and Qx
(Euler half-step) matrices from the Boris-SDC paper; Gauss-Lobatto nodes get
the symplectic IIIA/IIIB pairing trick.

State: ``u`` is a :class:`~pysdc_tpu.models.particles.Particles` pytree with
(M+1)-leading-axis leaves; ``f`` is the acceleration array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import LevelState, norm_max
from pysdc_tpu.core.sweeper import Sweeper
from pysdc_tpu.models.particles import Particles


def _nm(W, x):
    return jnp.tensordot(jnp.asarray(W, x.dtype), x, axes=(1, 0))


class VerletSweeper(Sweeper):
    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QI', 'IE')
        params.setdefault('QE', 'EE')
        params.setdefault('node_type', 'LEGENDRE')
        params.setdefault('quad_type', 'LOBATTO')
        super().__init__(params)

        QI = self.get_Qdelta_implicit(params['QI'])
        QE = self.get_Qdelta_explicit(params['QE'])
        self.QT = 0.5 * (QI + QE)
        self.Qx = QE @ self.QT + 0.5 * QE * QE
        coll = self.coll
        QQ = np.zeros_like(coll.Qmat)
        if coll.node_type == 'LEGENDRE' and coll.quad_type == 'LOBATTO':
            # Lobatto IIIA/IIIB pairing: symplectic (reference verlet.py:63-71)
            M = coll.num_nodes
            for m in range(M):
                for n in range(M):
                    QQ[m + 1, n + 1] = coll.weights[n] * (1.0 - coll.Qmat[n + 1, m + 1] / coll.weights[m])
            QQ = coll.Qmat @ QQ
        else:
            QQ = coll.Qmat @ coll.Qmat
        self.QQ = QQ
        self.qQ = coll.weights @ coll.Qmat[1:, 1:]

    # -- protocol -------------------------------------------------------
    def predict(self, prob, u0: Particles, t, dt, random_val: float = 0.0) -> LevelState:
        M = self.coll.num_nodes
        f0 = prob.eval_f(u0, t)
        u = jax.tree_util.tree_map(lambda leaf: jnp.broadcast_to(leaf, (M + 1,) + leaf.shape), u0)
        f = jnp.broadcast_to(f0, (M + 1,) + f0.shape)
        tau = Particles(
            pos=jnp.zeros((M,) + u0.pos.shape, u0.pos.dtype),
            vel=jnp.zeros((M,) + u0.vel.shape, u0.vel.dtype),
        )
        return LevelState(u=u, f=f, tau=tau)

    def integrate(self, state: LevelState, dt):
        """Particles integral (reference verlet.py:151-173): positions get
        dt^2 QQ f + dt Q (column-sums) u0.vel, velocities dt Q f."""
        f = state.f[1:]
        u0 = jax.tree_util.tree_map(lambda leaf: leaf[0], state.u)
        Q = self.coll.q
        rowsum = jnp.asarray(Q.sum(axis=1), f.dtype)
        pos = dt * (dt * _nm(self.QQ[1:, 1:], f)) + dt * rowsum[(...,) + (None,) * u0.vel.ndim] * u0.vel[None]
        vel = dt * _nm(Q, f)
        return Particles(pos=pos, vel=vel)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        ts = self.node_times(t, dt)
        f = state.f[1:]
        integral = self.integrate(state, dt)
        # subtract preconditioner part of the old iterate, add u0 and tau
        pos_known = (
            integral.pos
            - dt * (dt * _nm(self.Qx[1:, 1:], f))
            + state.u.pos[0][None]
            + state.tau.pos
        )
        vel_known = integral.vel - dt * _nm(self.QT[1:, 1:], f) + state.u.vel[0][None] + state.tau.vel

        pos_list = [state.u.pos[m] for m in range(M + 1)]
        vel_list = [state.u.vel[m] for m in range(M + 1)]
        f_list = [state.f[m] for m in range(M + 1)]
        for m in range(M):
            pos_new = pos_known[m]
            vel_new = vel_known[m]
            for j in range(1, m + 1):
                if self.Qx[m + 1, j] != 0.0:
                    pos_new = pos_new + dt * (dt * self.Qx[m + 1, j] * f_list[j])
                if self.QT[m + 1, j] != 0.0:
                    vel_new = vel_new + dt * self.QT[m + 1, j] * f_list[j]
            pos_list[m + 1] = pos_new
            f_list[m + 1] = prob.eval_f(Particles(pos=pos_new, vel=vel_new), ts[m])
            vel_list[m + 1] = vel_new + dt * self.QT[m + 1, m + 1] * f_list[m + 1]

        u = Particles(pos=jnp.stack(pos_list, 0), vel=jnp.stack(vel_list, 0))
        return LevelState(u=u, f=jnp.stack(f_list, 0), tau=state.tau)

    def compute_residual(self, state: LevelState, dt, residual_type: str = 'full_abs', t=0.0):
        integral = self.integrate(state, dt)
        res = Particles(
            pos=integral.pos + state.tau.pos + state.u.pos[0][None] - state.u.pos[1:],
            vel=integral.vel + state.tau.vel + state.u.vel[0][None] - state.u.vel[1:],
        )
        M = res.pos.shape[0]
        node_norms = jnp.stack(
            [jnp.maximum(norm_max(res.pos[m]), norm_max(res.vel[m])) for m in range(M)]
        )
        if residual_type == 'full_abs':
            norm = jnp.max(node_norms)
        elif residual_type == 'last_abs':
            norm = node_norms[-1]
        elif residual_type == 'full_rel':
            norm = jnp.max(node_norms) / norm_max(state.u)
        else:
            norm = node_norms[-1] / norm_max(state.u)
        return res, norm

    def compute_end_point(self, state: LevelState, t, dt):
        if self.coll.right_is_node and not self.do_coll_update:
            return jax.tree_util.tree_map(lambda leaf: leaf[-1], state.u)
        f = state.f[1:]
        u0 = jax.tree_util.tree_map(lambda leaf: leaf[0], state.u)
        w = jnp.asarray(self.coll.weights, f.dtype)
        wsum = float(np.sum(self.coll.weights))
        pos = u0.pos + dt * (dt * jnp.tensordot(jnp.asarray(self.qQ, f.dtype), f, axes=(0, 0))) + dt * wsum * u0.vel
        vel = u0.vel + dt * jnp.tensordot(w, f, axes=(0, 0))
        pos = pos + state.tau.pos[-1]
        vel = vel + state.tau.vel[-1]
        return Particles(pos=pos, vel=vel)
