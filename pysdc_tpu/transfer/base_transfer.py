"""Space-time transfer between two levels with FAS tau correction.

Faithful counterpart of the reference ``BaseTransfer``
(``pySDC/core/base_transfer.py:25-251``): restriction builds the FAS
correction ``tau_G = R I_F(u_F) - I_G(R u_F)`` (plus restricted fine tau),
prolongation adds the interpolated coarse *increment* ``u_G - u_G^old`` and
re-evaluates f on the fine level.  Collocation-node transfer matrices come
from barycentric Lagrange interpolation between node sets.

Each direction compiles to ONE jitted device function (restriction: 2 space
transfers + 2 node-matrix contractions + 1 batched coarse RHS evaluation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import UnlockError
from pysdc_tpu.core.state import LevelState, f_total
from pysdc_tpu.ops.lagrange import interpolation_matrix


def _apply_node_matrix(M: np.ndarray, x):
    """Apply an (n_to, n_from) matrix along the leading node axis of a pytree
    at full input precision (bf16 MXU inputs would floor the FAS correction —
    see core/precision.py)."""
    from pysdc_tpu.core.precision import coeff_contract

    return jax.tree_util.tree_map(lambda leaf: coeff_contract(M, leaf), x)


class BaseTransfer:
    def __init__(self, fine_level, coarse_level, base_transfer_params: dict,
                 space_transfer_class, space_transfer_params: dict):
        self.params = dict(base_transfer_params)
        self.finter = self.params.get('finter', False)
        self.fine = fine_level
        self.coarse = coarse_level

        fine_nodes = fine_level.sweep.coll.nodes
        coarse_nodes = coarse_level.sweep.coll.nodes
        if len(fine_nodes) == len(coarse_nodes):
            self.Pcoll = np.eye(len(fine_nodes))
            self.Rcoll = np.eye(len(fine_nodes))
        else:
            self.Pcoll = self.get_transfer_matrix_Q(fine_nodes, coarse_nodes)
            self.Rcoll = self.get_transfer_matrix_Q(coarse_nodes, fine_nodes)

        self.space_transfer = space_transfer_class(
            fine_prob=self.fine.prob, coarse_prob=self.coarse.prob, params=space_transfer_params
        )

        coarse_op = self.params.get('coarse_op', 'rediscretize')
        if coarse_op == 'galerkin':
            self._install_galerkin_coarse_operator()
        elif coarse_op != 'rediscretize':
            raise ValueError(f"coarse_op must be 'rediscretize' or 'galerkin', got {coarse_op!r}")

        self._restrict_jit = jax.jit(self._restrict_pure)
        self._prolong_jit = jax.jit(self._prolong_pure)
        self._prolong_f_jit = jax.jit(self._prolong_f_pure)

    def _install_galerkin_coarse_operator(self):
        """Replace the coarse level's re-discretized operator with the
        variational Galerkin product ``A_c = R A_f P``, assembled by SpGEMM
        (:func:`pysdc_tpu.ops.sparse.galerkin_product`) from the transfer's
        own per-axis interpolation matrices.  This is the sparse-P/R role of
        the reference's transfer machinery (``helpers/transfer_helper.py:
        91-139``) taken to its SpGEMM conclusion: the coarse operator comes
        from the fine one algebraically instead of by re-discretization.
        Requires both problems on the assembled-CSR backend
        (``backend='sparse'``) and a MeshTransfer space transfer."""
        import numpy as np

        from pysdc_tpu.core.errors import TransferError
        from pysdc_tpu.ops.sparse import CSR, galerkin_product
        from pysdc_tpu.ops.sparse_op import SparseOperator

        st = self.space_transfer
        A_f = getattr(self.fine.prob, 'A', None)
        A_c_old = getattr(self.coarse.prob, 'A', None)
        if not (isinstance(A_f, SparseOperator) and isinstance(A_c_old, SparseOperator)):
            raise TransferError(
                "coarse_op='galerkin' needs assembled CSR operators on both levels "
                "(problem backend='sparse')"
            )
        if not hasattr(st, 'P_1d'):
            raise TransferError("coarse_op='galerkin' needs a MeshTransfer space transfer")
        if A_c_old.bc_rhs is not None and np.any(np.asarray(A_c_old.bc_rhs)):
            raise TransferError(
                "coarse_op='galerkin' supports homogeneous boundaries only "
                '(inhomogeneous bc_rhs would need its own restriction)'
            )

        P_nd = R_nd = None
        for P1, R1 in zip(st.P_1d, st.R_1d):
            Pc = CSR.from_dense(np.asarray(P1))
            Rc = CSR.from_dense(np.asarray(R1))
            P_nd = Pc if P_nd is None else P_nd.kron(Pc)
            R_nd = Rc if R_nd is None else R_nd.kron(Rc)

        A_c = galerkin_product(P_nd, A_f.A, R_nd)
        self.coarse.prob.A = SparseOperator(
            A_c, grid_shape=self.coarse.prob.shape, bc_rhs=None
        )
        # the level factored (I - dt*q*A) for the old operator at setup;
        # redo it for the Galerkin one
        QI = getattr(self.coarse.sweep, 'QI', None)
        if QI is not None and self.coarse.params.dt is not None:
            self.coarse.prob.prepare_node_solvers(
                float(self.coarse.params.dt), np.diag(np.asarray(QI))[1:]
            )

    @staticmethod
    def get_transfer_matrix_Q(f_nodes, c_nodes) -> np.ndarray:
        """Lagrange interpolation from c_nodes to f_nodes
        (reference base_transfer.py:79-91)."""
        return interpolation_matrix(c_nodes, f_nodes)

    # -- pure device functions -----------------------------------------
    def _restrict_pure(self, F_state: LevelState, t_coarse, dt_coarse, dt_fine):
        SF, SG = self.fine.sweep, self.coarse.sweep
        PG = self.coarse.prob
        Mc = SG.coll.num_nodes

        # restrict node values in space, then in collocation
        u_f_space = self.space_transfer.restrict(F_state.u)  # (Mf+1, *coarse_shape)
        u0_c = u_f_space[0]
        u_c_nodes = _apply_node_matrix(self.Rcoll, u_f_space[1:])

        # re-evaluate f on the coarse level
        ts = SG.node_times(t_coarse, dt_coarse)
        f0_c = PG.eval_f(u0_c, t_coarse)
        f_c_nodes = PG.eval_f_batched(u_c_nodes, ts)

        u_c = jnp.concatenate([u0_c[None], u_c_nodes], axis=0)
        f_c = jax.tree_util.tree_map(
            lambda l0, ln: jnp.concatenate([l0[None], ln], axis=0), f0_c, f_c_nodes
        )

        # FAS: tau_G = R I_F(u_F) - I_G(R u_F) (+ R tau_F)
        zero_tau_c = jnp.zeros((Mc,) + u0_c.shape, u0_c.dtype)
        G_tmp = LevelState(u=u_c, f=f_c, tau=zero_tau_c)
        tau_G = SG.integrate(G_tmp, dt_coarse)

        tau_F_int = SF.integrate(F_state, dt_fine)  # (Mf, *fine_shape)
        tau_FG = _apply_node_matrix(self.Rcoll, self.space_transfer.restrict(tau_F_int))

        tau = tau_FG - tau_G
        # restrict any existing fine tau correction as well
        tau = tau + _apply_node_matrix(self.Rcoll, self.space_transfer.restrict(F_state.tau))

        G_state = LevelState(u=u_c, f=f_c, tau=tau)
        uold = u_c
        fold = f_c
        return G_state, uold, fold

    def _prolong_pure(self, F_state: LevelState, G_state: LevelState, G_uold, t_fine, dt_fine):
        SF = self.fine.sweep
        PF = self.fine.prob

        diff = G_state.u[1:] - G_uold[1:]
        corr = self.space_transfer.prolong(_apply_node_matrix(self.Pcoll, diff))
        u_nodes = F_state.u[1:] + corr

        ts = SF.node_times(t_fine, dt_fine)
        f_nodes = PF.eval_f_batched(u_nodes, ts)
        u = jnp.concatenate([F_state.u[:1], u_nodes], axis=0)
        f = jax.tree_util.tree_map(
            lambda lf, ln: jnp.concatenate([lf[:1], ln], axis=0), F_state.f, f_nodes
        )
        return LevelState(u=u, f=f, tau=F_state.tau)

    def _prolong_f_pure(self, F_state: LevelState, G_state: LevelState, G_uold, G_fold):
        """Prolong both u and f corrections without re-evaluating f
        (reference base_transfer.py:217-251)."""
        diff_u = G_state.u[1:] - G_uold[1:]
        corr_u = self.space_transfer.prolong(_apply_node_matrix(self.Pcoll, diff_u))
        u = jnp.concatenate([F_state.u[:1], F_state.u[1:] + corr_u], axis=0)

        diff_f = jax.tree_util.tree_map(lambda a, b: a[1:] - b[1:], G_state.f, G_fold)
        corr_f = self.space_transfer.prolong(_apply_node_matrix(self.Pcoll, diff_f))
        f = jax.tree_util.tree_map(
            lambda lf, c: jnp.concatenate([lf[:1], lf[1:] + c], axis=0), F_state.f, corr_f
        )
        return LevelState(u=u, f=f, tau=F_state.tau)

    # -- host protocol ---------------------------------------------------
    def restrict(self):
        F, G = self.fine, self.coarse
        if not F.status.unlocked:
            raise UnlockError('fine level is still locked, cannot use data from there')
        G_state, uold, fold = self._restrict_jit(
            F.state, G.status.time, G.params.dt, F.params.dt
        )
        G.state = G_state
        G.uold = uold
        G.fold = fold
        G.status.unlocked = True

    def prolong(self):
        F, G = self.fine, self.coarse
        if not G.status.unlocked:
            raise UnlockError('coarse level is still locked, cannot use data from there')
        if self.finter:
            F.state = self._prolong_f_jit(F.state, G.state, G.uold, G.fold)
        else:
            F.state = self._prolong_jit(F.state, G.state, G.uold, F.status.time, F.params.dt)

    def prolong_f(self):
        F, G = self.fine, self.coarse
        if not G.status.unlocked:
            raise UnlockError('coarse level is still locked, cannot use data from there')
        F.state = self._prolong_f_jit(F.state, G.state, G.uold, G.fold)
