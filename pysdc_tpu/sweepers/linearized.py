"""Newton-linearized node-parallel SDC sweepers (the parallelSDC family).

TPU-native counterparts of the reference's parallelSDC project sweepers
(``projects/parallelSDC/linearized_implicit_parallel.py:6-95``,
``linearized_implicit_fixed_parallel.py:6-90``,
``linearized_implicit_fixed_parallel_prec.py:6-35``): instead of a
nonlinear Newton solve per node, one sweep linearizes the collocation
problem around the current iterate and solves the M node systems
SIMULTANEOUSLY in the eigenbasis of the chosen node-coupling matrix:

    G(u)_m   = u0 + dt (Q f(u))_m - u_m + tau_m       (collocation residual)
    Gv       = V^-1 G(u)                               (complex transform)
    x_m      : (I - dt D_m J) x_m = Gv_m               (decoupled solves)
    u^{k+1}  = u^k + Re(V x)

where D, V come from ``eig(Q)`` (Jacobian frozen: the exact parallel
Newton-SDC of the "fixed" variant) or ``eig(QDelta)`` (the preconditioned
flavors), and J is the RHS Jacobian — frozen at one node, or evaluated
per node for the non-fixed variant.

TPU mapping: the reference funds the "hell yeah, this is parallel" node
loop with one MPI rank per node; here the M complex solves are ONE vmapped
``jnp.linalg.solve`` batch (MXU-friendly dense factorizations) and the
eigen-transforms are two complex matmuls.  Jacobians come from the
problem's ``eval_jacobian`` when it defines one, else from ``jax.jacfwd``
of the flattened RHS — no hand-coded derivatives needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ParameterError
from pysdc_tpu.core.state import LevelState
from pysdc_tpu.core.sweeper import _tensordot_nodes
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit


class LinearizedImplicitParallel(GenericImplicit):
    """params (on top of GenericImplicit's):

    - ``jacobian``: ``'per_node'`` — evaluate J at every node's current
      iterate (reference ``linearized_implicit_parallel``); or an int node
      index 0..M to freeze J at that node's iterate (reference
      ``fixed_time_in_jacobian``, default of the fixed variants).
    - ``basis``: ``'Q'`` — diagonalize the full collocation matrix (exact
      linearized collocation solve per sweep, reference
      ``linearized_implicit_fixed_parallel``); or ``'QI'`` — diagonalize
      the QDelta preconditioner (reference ``linearized_implicit_parallel``
      / ``..._fixed_parallel_prec``).
    """

    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('jacobian', 0)
        params.setdefault('basis', 'Q')
        super().__init__(params)
        self.jacobian = params['jacobian']
        self.basis = params['basis']
        M = self.coll.num_nodes
        if self.jacobian != 'per_node' and self.jacobian not in range(M + 1):
            raise ParameterError(f'jacobian must be "per_node" or a node index 0..{M}')
        if self.basis == 'Q':
            A = np.asarray(self.coll.q)
        elif self.basis == 'QI':
            A = np.asarray(self.QI[1:, 1:])
        else:
            raise ParameterError(f'basis must be "Q" or "QI", got {self.basis!r}')
        D, V = np.linalg.eig(A)
        self.D, self.V, self.Vi = D, V, np.linalg.inv(V)
        self.parallelizable = True  # node solves decouple in the eigenbasis

    def _jacobians(self, prob, u_nodes, u0, ts, t):
        """(M, n, n) complex Jacobian stack (frozen J is broadcast)."""
        n = int(np.prod(u0.shape))
        shape = u0.shape

        def jac(u, tm):
            if hasattr(prob, 'eval_jacobian'):
                return jnp.asarray(prob.eval_jacobian(u, tm)).reshape(n, n)
            return jax.jacfwd(lambda v: prob.eval_f(v.reshape(shape), tm).ravel())(u.ravel())

        if self.jacobian == 'per_node':
            return jax.vmap(jac)(u_nodes, ts)
        u_fix = u0 if self.jacobian == 0 else u_nodes[self.jacobian - 1]
        t_fix = t if self.jacobian == 0 else ts[self.jacobian - 1]
        J = jac(u_fix, t_fix)
        return jnp.broadcast_to(J, (u_nodes.shape[0],) + J.shape)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        ts = self.node_times(t, dt)
        u0, u_nodes, f_nodes = state.u[0], state.u[1:], state.f[1:]
        n = int(np.prod(u0.shape))
        cdtype = jnp.complex128 if u0.dtype == jnp.float64 else jnp.complex64

        # collocation residual at the current iterate (with FAS tau)
        Gu = dt * _tensordot_nodes(self.coll.q, f_nodes) + u0[None] + state.tau - u_nodes

        # forward transform into the eigenbasis (complex matmul over nodes)
        Gu_flat = Gu.reshape(M, n).astype(cdtype)
        Gv = jnp.asarray(self.Vi, cdtype) @ Gu_flat

        J = self._jacobians(prob, u_nodes, u0, ts, t).astype(cdtype)
        eye = jnp.eye(n, dtype=cdtype)
        D = jnp.asarray(self.D.astype(np.complex128), cdtype)

        # M decoupled dense solves, one vmapped batch on the MXU
        lhs = eye[None] - dt * D[:, None, None] * J
        x = jax.vmap(jnp.linalg.solve)(lhs, Gv)

        # backward transform + Newton update; re-evaluate the RHS
        du = jnp.real(jnp.asarray(self.V, cdtype) @ x).astype(u0.dtype)
        u_new = u_nodes + du.reshape(u_nodes.shape)
        f_new = jax.vmap(prob.eval_f)(u_new, ts)

        u = jnp.concatenate([state.u[:1], u_new], axis=0)
        f = jnp.concatenate([state.f[:1], f_new], axis=0)
        return LevelState(u=u, f=f, tau=state.tau)
