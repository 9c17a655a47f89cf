"""ParaDiag inner sweepers: direct collocation solves via diagonalization.

Counterpart of the reference ``QDiagonalization`` / ``QDiagonalizationIMEX``
(``implementations/sweeper_classes/ParaDiagSweepers.py:11-170``): eigendecompose
``Q G^{-1} = S diag(w) S^{-1}``, solve M decoupled complex-shifted systems,
transform back.  In ParaDiag mode (``ignore_ic=True``) the input is the
node-local residual and the output an increment; in SDC mode
(``ignore_ic=False``) the collocation problem is solved directly from u0.

All node transforms are small dense (M x M) complex matmuls batched over the
spatial grid — ideal MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import IMEX, LevelState, f_total
from pysdc_tpu.core.sweeper import Sweeper


def compute_diagonalization(A: np.ndarray):
    """A = S diag(w) S^{-1} (reference ParaDiagSweepers.py:53-69)."""
    w, S = np.linalg.eig(A)
    S_inv = np.linalg.inv(S)
    assert np.allclose(S @ np.diag(w) @ S_inv, A)
    return w, S, S_inv


def _node_matmul(M: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(M, M) complex matrix applied along the leading node axis."""
    return jnp.tensordot(jnp.asarray(M), x, axes=(1, 0))


class QDiagonalization(Sweeper):
    """params: num_nodes, quad_type, G_inv (np matrix, default identity),
    ignore_ic (default True), update_f_evals (default False)."""

    def __init__(self, params: dict):
        params = dict(params)
        super().__init__(params)
        M = self.coll.num_nodes
        self.G_inv = np.asarray(params.get('G_inv', np.eye(M)))
        self.ignore_ic = params.get('ignore_ic', True)
        self.update_f_evals = params.get('update_f_evals', False)
        self.set_G_inv(self.G_inv)

    def set_G_inv(self, G_inv: np.ndarray):
        self.G_inv = G_inv
        self.w, self.S, self.S_inv = compute_diagonalization(self.coll.q @ G_inv)

    def _solve_diagonal(self, prob, x1, u_avg, t, dt):
        """Per-node complex-shifted Jacobian solves, batched."""
        ts = self.node_times(t, dt)
        factors = dt * jnp.asarray(self.w)

        def solve_one(rhs, factor, tm):
            return prob.solve_jacobian(rhs, factor, u_avg, tm)

        return jax.vmap(solve_one)(x1, factors, ts)

    def solve_increment(self, prob, residual, u_avg, t, dt):
        """ParaDiag mode: increment = G_inv S solve(S_inv residual)
        (reference ParaDiagSweepers.py:89-133)."""
        x1 = _node_matmul(self.S_inv, residual.astype(jnp.asarray(self.S_inv).dtype))
        x2 = self._solve_diagonal(prob, x1, u_avg, t, dt)
        y = _node_matmul(self.G_inv.astype(complex), _node_matmul(self.S, x2))
        return y

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        """SDC mode (ignore_ic=False): solve the collocation problem directly
        with u0 as the right-hand side for every node."""
        M = self.coll.num_nodes
        u0c = state.u[0].astype(jnp.asarray(self.S_inv).dtype)
        rhs = jnp.broadcast_to(u0c, (M,) + u0c.shape)
        x1 = _node_matmul(self.S_inv, rhs)
        x2 = self._solve_diagonal(prob, x1, None, t, dt)
        y = _node_matmul(self.G_inv.astype(complex), _node_matmul(self.S, x2))
        if not jnp.iscomplexobj(state.u):
            y = jnp.real(y)
        u = jnp.concatenate([state.u[:1], y.astype(state.u.dtype)], axis=0)
        ts = self.node_times(t, dt)
        f_nodes = prob.eval_f_batched(u[1:], ts)
        f = jax.tree_util.tree_map(
            lambda l0, ln: jnp.concatenate([l0[None], ln], axis=0),
            prob.eval_f(state.u[0], t),
            f_nodes,
        )
        return LevelState(u=u, f=f, tau=state.tau)


class QDiagonalizationIMEX(QDiagonalization):
    """IMEX flavor: the residual integrates impl+expl, the solve shifts only
    the implicit part (reference ParaDiagSweepers.py:165-170)."""

    def integrate(self, state: LevelState, dt):
        ft = f_total(state.f)[1:]
        return dt * jnp.tensordot(jnp.asarray(self.coll.q, ft.dtype), ft, axes=(1, 0))
