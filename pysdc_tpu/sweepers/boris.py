"""Boris-SDC sweeper for charged particles in electromagnetic fields.

Counterpart of the reference ``boris_2nd_order``
(``implementations/sweeper_classes/boris_2nd_order.py:6-314``): node-to-node
S/ST/SQ/Sx matrices derived from the Verlet Q-family, explicit position
update, and the Boris rotation for the velocity (velocity-dependent Lorentz
force handled without a linear solve).  The RHS container is the problem's
field type (e.g. :class:`~pysdc_tpu.models.particles.EMFields`); the problem
provides ``build_f`` (fields -> acceleration) and ``boris_solver``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import LevelState, norm_max
from pysdc_tpu.core.sweeper import Sweeper
from pysdc_tpu.models.particles import Particles


class BorisSDC(Sweeper):
    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QI', 'IE')
        params.setdefault('QE', 'EE')
        params.setdefault('quad_type', 'LOBATTO')
        super().__init__(params)

        QI = self.get_Qdelta_implicit(params['QI'])
        QE = self.get_Qdelta_explicit(params['QE'])
        coll = self.coll
        QT = 0.5 * (QI + QE)
        Qx = QE @ QT + 0.5 * QE * QE
        M = coll.num_nodes

        Sx = np.zeros_like(coll.Qmat)
        ST = np.zeros_like(coll.Qmat)
        S = np.zeros_like(coll.Qmat)
        Sx[0, :] = Qx[0, :]
        ST[0, :] = QT[0, :]
        S[0, :] = coll.Qmat[0, :]
        for m in range(M):
            Sx[m + 1, :] = Qx[m + 1, :] - Qx[m, :]
            ST[m + 1, :] = QT[m + 1, :] - QT[m, :]
            S[m + 1, :] = coll.Qmat[m + 1, :] - coll.Qmat[m, :]
        self.S, self.ST, self.Sx = S, ST, Sx
        self.SQ = S @ coll.Qmat
        self.QQ = coll.Qmat @ coll.Qmat
        self.QI, self.QT, self.Qx = QI, QT, Qx
        self.qQ = coll.weights @ coll.Qmat[1:, 1:]

    def _prob(self, prob):
        """Resolve the (static) problem: passed explicitly or from the level
        this sweeper is attached to (needed because integrate/residual/
        end-point signatures are problem-free in the base protocol)."""
        return prob if prob is not None else self.level.prob

    # -- helpers ---------------------------------------------------------
    def _build_f_all(self, prob, state: LevelState, t, dt):
        """Accelerations at nodes 0..M from stored fields (build_f)."""
        nodes_t = jnp.concatenate([jnp.asarray([t]), t + dt * jnp.asarray(self.coll.nodes)])
        return jax.vmap(
            lambda f, u, tt: prob.build_f(f, u, tt)
        )(state.f, state.u, nodes_t)

    def predict(self, prob, u0: Particles, t, dt, random_val: float = 0.0) -> LevelState:
        M = self.coll.num_nodes
        f0 = prob.eval_f(u0, t)
        u = jax.tree_util.tree_map(lambda leaf: jnp.broadcast_to(leaf, (M + 1,) + leaf.shape), u0)
        f = jax.tree_util.tree_map(lambda leaf: jnp.broadcast_to(leaf, (M + 1,) + leaf.shape), f0)
        tau = Particles(
            pos=jnp.zeros((M,) + u0.pos.shape, u0.pos.dtype),
            vel=jnp.zeros((M,) + u0.vel.shape, u0.vel.dtype),
        )
        return LevelState(u=u, f=f, tau=tau)

    def integrate(self, state: LevelState, dt, prob=None, t=0.0):
        """0-to-node integrals (reference boris_2nd_order.py:156-180)."""
        fa = self._build_f_all(self._prob(prob), state, t, dt)[1:]  # (M, 3, N)
        Q = self.coll.q
        u0 = jax.tree_util.tree_map(lambda leaf: leaf[0], state.u)
        rowsum = jnp.asarray(Q.sum(axis=1), fa.dtype)
        pos = dt * (dt * jnp.tensordot(jnp.asarray(self.QQ[1:, 1:], fa.dtype), fa, axes=(1, 0)))
        pos = pos + dt * rowsum[(...,) + (None,) * u0.vel.ndim] * u0.vel[None]
        vel = dt * jnp.tensordot(jnp.asarray(Q, fa.dtype), fa, axes=(1, 0))
        return Particles(pos=pos, vel=vel)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        ts = self.node_times(t, dt)
        fa = self._build_f_all(prob, state, t, dt)  # (M+1, 3, N) accelerations

        # known parts: node-to-node integrals minus preconditioner parts
        SQSx = jnp.asarray(self.SQ[1:, :] - self.Sx[1:, :], fa.dtype)
        SST = jnp.asarray(self.S[1:, :] - self.ST[1:, :], fa.dtype)
        int_pos = dt * (dt * jnp.tensordot(SQSx, fa, axes=(1, 0))) + state.tau.pos
        int_vel = dt * jnp.tensordot(SST, fa, axes=(1, 0)) + state.tau.vel
        # tau is 0-to-node; convert to node-to-node (reference :124-127)
        int_pos = int_pos.at[1:].add(-state.tau.pos[:-1])
        int_vel = int_vel.at[1:].add(-state.tau.vel[:-1])

        pos_list = [state.u.pos[m] for m in range(M + 1)]
        vel_list = [state.u.vel[m] for m in range(M + 1)]
        f_list = [jax.tree_util.tree_map(lambda leaf: leaf[m], state.f) for m in range(M + 1)]
        fa_new = [fa[m] for m in range(M + 1)]

        for m in range(M):
            tmp_pos = int_pos[m]
            tmp_vel = int_vel[m]
            for j in range(m + 1):
                if self.Sx[m + 1, j] != 0.0:
                    tmp_pos = tmp_pos + dt * (dt * self.Sx[m + 1, j] * fa_new[j])
            pos_list[m + 1] = tmp_pos + pos_list[m] + dt * self.coll.delta_m[m] * vel_list[0]

            u_mid = Particles(pos=pos_list[m + 1], vel=vel_list[m + 1])
            f_list[m + 1] = prob.eval_f(u_mid, ts[m])

            old_parts = Particles(pos=pos_list[m], vel=vel_list[m])
            vel_list[m + 1] = prob.boris_solver(
                tmp_vel, dt * np.diag(self.QI)[m + 1], f_list[m], f_list[m + 1], old_parts
            )
            t_node = ts[m]
            fa_new[m + 1] = prob.build_f(
                f_list[m + 1], Particles(pos=pos_list[m + 1], vel=vel_list[m + 1]), t_node
            )

        u = Particles(pos=jnp.stack(pos_list, 0), vel=jnp.stack(vel_list, 0))
        f = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves, 0), *f_list)
        return LevelState(u=u, f=f, tau=state.tau)

    def compute_residual(self, state: LevelState, dt, residual_type: str = 'full_abs', prob=None, t=0.0):
        integral = self.integrate(state, dt, prob=prob, t=t)
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
        else:
            norm = jnp.max(node_norms) / norm_max(state.u)
        return res, norm

    def compute_end_point(self, state: LevelState, t, dt, prob=None):
        if self.coll.right_is_node and not self.do_coll_update:
            return jax.tree_util.tree_map(lambda leaf: leaf[-1], state.u)
        fa = self._build_f_all(self._prob(prob), state, t, dt)[1:]
        u0 = jax.tree_util.tree_map(lambda leaf: leaf[0], state.u)
        w = jnp.asarray(self.coll.weights, fa.dtype)
        wsum = float(np.sum(self.coll.weights))
        pos = u0.pos + dt * (dt * jnp.tensordot(jnp.asarray(self.qQ, fa.dtype), fa, axes=(0, 0))) + dt * wsum * u0.vel
        vel = u0.vel + dt * jnp.tensordot(w, fa, axes=(0, 0))
        return Particles(pos=pos + state.tau.pos[-1], vel=vel + state.tau.vel[-1])
