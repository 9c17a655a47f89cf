"""Matrix-based MSSDC/MLSDC/PFASST controller (verification tool).

Counterpart of the reference ``controller_matrix_nonMPI``
(``projects/matrixPFASST/controller_matrix_nonMPI.py:8-357``): the whole
space-time block iteration is assembled as one composite matrix

    C = I - dt (I_steps x Q x A) - (E x N x I_space)
    P = I - dt (I_steps x QDelta x A)                   (fine smoother)
    P_c likewise on the coarse level, with transfer T_cf/T_fc

and PFASST becomes the stationary iteration
``u += T_cf P_c^{-1} T_fc r;  r = u0 - C u;  u += P^{-1} r`` — exactly the
algorithm the step-based controller executes, so iteration counts and
solutions must match to round-off.  Valuable as an independent check of the
controller machinery and for studying the propagation matrix spectrum.

TPU-native: matrices are assembled once on the host (kron products), the
fine/coarse preconditioners are LU-factorized once, and each iteration is a
handful of dense triangular solves + matmuls on the MXU — no per-node Python.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ControllerError
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit


def dense_from_apply(apply_fn, n: int, dtype=np.float64) -> np.ndarray:
    """Materialize a dense matrix from a linear operator by applying it to
    the identity (columns batched through vmap)."""
    eye = jnp.eye(n, dtype=dtype)
    cols = jax.vmap(apply_fn)(eye)  # row i of cols = A e_i
    return np.asarray(cols).T


class ControllerMatrixNonMPI(ControllerNonMPI):
    """Serial matrix-based controller; restrictions as in the reference:
    GenericImplicit sweeper, linear problems (operator ``prob.A``),
    right-is-node quadrature, <= 2 levels, constant dt."""

    def __init__(self, num_procs, controller_params, description):
        if description['sweeper_class'] is not GenericImplicit:
            raise ControllerError('matrix controller only works with GenericImplicit')
        controller_params = dict(controller_params)
        controller_params.setdefault('all_to_done', True)
        super().__init__(num_procs, controller_params, description)
        if self.params.predict_type is not None:
            raise ControllerError('matrix controller has no predictor')

        self.nsteps = len(self.MS)
        self.nlevels = len(self.MS[0].levels)
        if self.nlevels > 2:
            raise ControllerError('matrix-PFASST supports at most 2 levels')
        lvl = self.MS[0].levels[0]
        if not lvl.sweep.coll.right_is_node:
            raise ControllerError('need right_is_node quadrature (RADAU-RIGHT/LOBATTO)')
        self.nnodes = lvl.sweep.coll.num_nodes
        self.nspace = int(np.prod(lvl.prob.shape))
        self.dt = lvl.params.dt
        self.tol = lvl.params.restol
        self.maxiter = self.MS[0].params.maxiter
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

        prob = lvl.prob
        shape = lvl.prob.shape
        A = dense_from_apply(lambda v: prob.eval_f(v.reshape(shape), 0.0).reshape(-1), self.nspace, dtype)
        Q = lvl.sweep.coll.Qmat[1:, 1:]
        Qd = lvl.sweep.QI[1:, 1:]

        E = np.zeros((self.nsteps, self.nsteps))
        np.fill_diagonal(E[1:, :], 1)
        N = np.zeros((self.nnodes, self.nnodes))
        N[:, -1] = 1

        I_big = np.eye(self.nsteps * self.nnodes * self.nspace)
        self.C = (
            I_big
            - self.dt * np.kron(np.eye(self.nsteps), np.kron(Q, A))
            - np.kron(E, np.kron(N, np.eye(self.nspace)))
        )
        self.P = I_big - self.dt * np.kron(np.eye(self.nsteps), np.kron(Qd, A))

        if self.nlevels > 1:
            lvl_c = self.MS[0].levels[1]
            prob_c = lvl_c.prob
            shape_c = prob_c.shape
            self.nspace_c = int(np.prod(shape_c))
            self.nnodes_c = lvl_c.sweep.coll.num_nodes
            Ac = dense_from_apply(
                lambda v: prob_c.eval_f(v.reshape(shape_c), 0.0).reshape(-1), self.nspace_c, dtype
            )
            Qdc = lvl_c.sweep.QI[1:, 1:]
            Nc = np.zeros((self.nnodes_c, self.nnodes_c))
            Nc[:, -1] = 1

            bt = self.MS[0].base_transfers[0]
            st = bt.space_transfer
            TcfA = dense_from_apply(
                lambda v: jnp.asarray(st.prolong(v.reshape(shape_c))).reshape(-1), self.nspace_c, dtype
            )  # (nspace, nspace_c) columns = prolong(e_i)
            TfcA = dense_from_apply(
                lambda v: jnp.asarray(st.restrict(v.reshape(shape))).reshape(-1), self.nspace, dtype
            )
            self.Tcf = np.kron(np.eye(self.nsteps), np.kron(bt.Pcoll, TcfA))
            self.Tfc = np.kron(np.eye(self.nsteps), np.kron(bt.Rcoll, TfcA))
            self.Pc = (
                np.eye(self.nsteps * self.nnodes_c * self.nspace_c)
                - self.dt * np.kron(np.eye(self.nsteps), np.kron(Qdc, Ac))
                - np.kron(E, np.kron(Nc, np.eye(self.nspace_c)))
            )

        # device-side LU factorizations + jitted iteration
        self._C = jnp.asarray(self.C, dtype)
        self._lu_P = jax.scipy.linalg.lu_factor(jnp.asarray(self.P, dtype))
        if self.nlevels > 1:
            self._lu_Pc = jax.scipy.linalg.lu_factor(jnp.asarray(self.Pc, dtype))
            self._Tcf = jnp.asarray(self.Tcf, dtype)
            self._Tfc = jnp.asarray(self.Tfc, dtype)

        nsweeps_f = lvl.params.nsweeps if hasattr(lvl.params, 'nsweeps') else 1
        nsweeps_c = (
            self.MS[0].levels[-1].params.nsweeps
            if self.nlevels > 1 and hasattr(self.MS[0].levels[-1].params, 'nsweeps')
            else 1
        )

        @jax.jit
        def _iterate(u, u0vec):
            res = u0vec - self._C @ u
            if self.nlevels > 1:
                for _ in range(nsweeps_c):
                    u = u + self._Tcf @ jax.scipy.linalg.lu_solve(self._lu_Pc, self._Tfc @ res)
                    res = u0vec - self._C @ u
            for _ in range(nsweeps_f):
                u = u + jax.scipy.linalg.lu_solve(self._lu_P, res)
                res = u0vec - self._C @ u
            return u, res, jnp.max(jnp.abs(res))

        self._iterate = _iterate

    # ------------------------------------------------------------------
    def run(self, u0, t0, Tend):
        for hook in self.hooks:
            hook.reset_stats()
        nblocks_f = (Tend - t0) / self.dt / self.nsteps
        if abs(nblocks_f - round(nblocks_f)) > 1e-8:
            raise ControllerError('dt, t0, Tend and num_procs do not divide the interval evenly')
        nblocks = int(round(nblocks_f))

        u0f = jnp.asarray(u0).reshape(-1)
        dtype = u0f.dtype
        spread = self.MS[0].levels[0].sweep.initial_guess == 'spread'

        for p, S in enumerate(self.MS):
            S.status.slot = p
            for hook in self.hooks:
                hook.pre_run(step=S, level_number=0)

        uend = u0f
        time = t0
        for _ in range(nblocks):
            u0vec = jnp.concatenate(
                [jnp.tile(uend, self.nnodes)]
                + [jnp.zeros((self.nsteps - 1) * self.nnodes * self.nspace, dtype)]
            )
            u = jnp.tile(uend, self.nsteps * self.nnodes) if spread else u0vec

            for p, S in enumerate(self.MS):
                S.status.iter = 0
                for lvl in S.levels:
                    lvl.status.time = time + p * self.dt
                for hook in self.hooks:
                    hook.pre_step(step=S, level_number=0)

            niter = 0
            res_norm = float(jnp.max(jnp.abs(u0vec - self._C @ u)))
            while res_norm > self.tol and niter < self.maxiter:
                niter += 1
                u, res, rn = self._iterate(u, u0vec)
                res_norm = float(rn)
                res_np = np.asarray(res).reshape(self.nsteps, -1)
                for p, S in enumerate(self.MS):
                    S.status.iter = niter
                    S.levels[0].status.residual = float(np.max(np.abs(res_np[p])))
                    for hook in self.hooks:
                        hook.post_iteration(step=S, level_number=0)

            for p, S in enumerate(self.MS):
                for hook in self.hooks:
                    hook.post_step(step=S, level_number=0)

            # uend = last node of the last step (right_is_node)
            uend = u[-self.nspace:]
            time += self.nsteps * self.dt

        for S in self.MS:
            for hook in self.hooks:
                hook.post_run(step=S, level_number=0)

        stats = {}
        for hook in self.hooks:
            stats.update(hook.return_stats())
        return uend.reshape(self.MS[0].levels[0].prob.shape), stats

    # ------------------------------------------------------------------
    def build_propagation_matrix(self, niter: int) -> np.ndarray:
        """Propagation matrix over one block for a fixed iteration count
        (reference controller_matrix_nonMPI.py:181-226)."""
        n_f = self.nsteps * self.nnodes * self.nspace
        Pinv = np.linalg.inv(self.P)
        precond_smoother = Pinv.copy()
        iter_mat_smoother = np.eye(n_f) - precond_smoother @ self.C
        lvl = self.MS[0].levels[0]
        nsweeps = lvl.params.nsweeps if hasattr(lvl.params, 'nsweeps') else 1
        for k in range(1, nsweeps):
            precond_smoother += np.linalg.matrix_power(iter_mat_smoother, k) @ Pinv
        iter_mat_smoother = np.linalg.matrix_power(iter_mat_smoother, nsweeps)

        if self.nlevels > 1:
            precond_cgc = self.Tcf @ np.linalg.inv(self.Pc) @ self.Tfc
            iter_mat_cgc = np.eye(n_f) - precond_cgc @ self.C
            iter_mat = iter_mat_smoother @ iter_mat_cgc
            precond = precond_smoother + precond_cgc - precond_smoother @ self.C @ precond_cgc
        else:
            iter_mat = iter_mat_smoother
            precond = precond_smoother

        Tspread = np.kron(np.ones(self.nsteps * self.nnodes), np.eye(self.nspace)).T
        Tnospread = np.kron(
            np.concatenate([[1], [0] * (self.nsteps - 1)]),
            np.kron(np.ones(self.nnodes), np.eye(self.nspace)),
        ).T
        Treduce = np.kron(
            np.concatenate([[0] * (self.nsteps * self.nnodes - 1), [1]]), np.eye(self.nspace)
        )

        if self.MS[0].levels[0].sweep.initial_guess == 'spread':
            mat = np.linalg.matrix_power(iter_mat, niter) @ Tspread
        else:
            mat = np.linalg.matrix_power(iter_mat, niter) @ Tnospread
        for k in range(niter):
            mat += np.linalg.matrix_power(iter_mat, k) @ precond @ Tnospread
        return Treduce @ mat
