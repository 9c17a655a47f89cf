"""Exponential SDC (ESDC) sweeper with IMEX-EXP splitting.

Counterpart of the reference Monodomain project's ``imexexp_1st_order``
(``projects/Monodomain/sweeper_classes/exponential_runge_kutta/
imexexp_1st_order.py:10-301``): the base integrator is an
implicit/explicit/exponential Euler (Rush-Larsen), the collocation integral
of the exponential terms is evaluated through phi-functions, and the result
is an exponential Runge-Kutta collocation method solved by SDC iterations.

TPU-native design decisions:
  - phi_k(z) are evaluated via the same 5-node Gauss quadrature of the
    integral representation as the reference (robust to round-off), but as
    one fused jnp einsum over (node-factor, quad-node, k, space) — no host
    loops, everything fuses into a handful of elementwise exps + matmuls.
  - The reference caches lambda/phi while u[0] is unchanged; here they are
    recomputed inside the jitted sweep (a few elementwise exps on the VPU is
    cheaper than host-side cache invalidation logic and keeps the sweep a
    pure function of the state).
  - The Fornberg derivative weights w[k,j] (p^(k)(0) = sum_j w[k,j] p(c_j))
    come from inverting the scaled Vandermonde V[j,k] = c_j^k / k! at setup.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import IMEXEXP, LevelState
from pysdc_tpu.core.sweeper import Sweeper, _tensordot_nodes


def derivative_weights_at_zero(c: np.ndarray) -> np.ndarray:
    """w with p^(k)(0) = sum_j w[k, j] p(c_j) for polynomials of degree < M
    (the reference uses numdifftools.fornberg; inverting the Taylor-scaled
    Vandermonde is equivalent for the small M used here)."""
    M = len(c)
    V = np.array([[cj**k / math.factorial(k) for k in range(M)] for cj in c])
    return np.linalg.inv(V)


class IMEXEXPSweeper(Sweeper):
    """Exponential SDC sweeper; problems must provide ``lmbda_eval`` and an
    ``IMEXEXP`` right-hand side with full-shape masked components."""

    def __init__(self, params: dict):
        params = dict(params)
        params.setdefault('QI', 'IE')
        params.setdefault('quad_type', 'RADAU-RIGHT')
        super().__init__(params)
        self.QI = self.get_Qdelta_implicit(params['QI'])
        self.delta = np.diagonal(self.QI)[1:]
        self.w = derivative_weights_at_zero(self.coll.nodes)
        # Gauss-Legendre rule on [0, 1] for the phi_k integrals.  The
        # reference uses 5 nodes (imexexp_1st_order.py:45); 12 keeps the
        # quadrature accurate out to z ~ -30 (stiff gates at large dt) at
        # negligible cost.
        x, wq = np.polynomial.legendre.leggauss(12)
        self._gl_nodes = 0.5 * (x + 1.0)
        self._gl_weights = 0.5 * wq

    # -- phi machinery --------------------------------------------------
    def _phi_eval(self, factors, K, lmbda):
        """phi[i, k-1] = phi_k(factors[i] * lmbda) for k = 1..K.

        phi_k(z) = int_0^1 e^{(1-s) z} s^{k-1}/(k-1)! ds, evaluated with the
        5-node Gauss rule (reference imexexp_1st_order.py:48-78).
        """
        ks = np.arange(1, K + 1)
        km1_fac = np.array([math.factorial(k - 1) for k in ks])
        factors = jnp.asarray(factors, lmbda.dtype)
        f_ = factors.reshape((-1, 1) + (1,) * lmbda.ndim)                     # (F,1,...)
        s_ = jnp.asarray(1.0 - self._gl_nodes, lmbda.dtype).reshape((1, -1) + (1,) * lmbda.ndim)
        exp_terms = jnp.exp(s_ * f_ * lmbda[None, None])                      # (F,J,*shape)
        wgt = jnp.asarray(
            (self._gl_weights[:, None] * self._gl_nodes[:, None] ** (ks[None, :] - 1)) / km1_fac[None, :],
            lmbda.dtype,
        )  # (J, K)
        return jnp.einsum('jk,fj...->fk...', wgt, exp_terms)

    def _lambda_phi_qmat(self, prob, u0, t, dt):
        """lambda(u0), phi table at the collocation nodes and the exponential
        quadrature tensor Qmat_exp[i, j] (reference :80-119)."""
        M = self.coll.num_nodes
        c = self.coll.nodes
        lmbda = prob.lmbda_eval(u0, t)
        phi = self._phi_eval(dt * c, M, lmbda)          # (M, M, *shape)
        phi_one = self._phi_eval(dt * self.delta, 1, lmbda)[:, 0]  # (M, *shape)
        # Qmat_exp[i, j] = sum_k w[k, j] * c_i^{k+1} * phi_{k+1}(dt c_i lmbda)
        k = np.arange(M)
        cw = np.asarray(c)[:, None] ** (k[None, :] + 1)  # (M, M) = c_i^{k+1}
        wgt = jnp.asarray(cw[:, :, None] * np.asarray(self.w)[None, :, :], lmbda.dtype)  # (i,k,j)
        Qmat_exp = jnp.einsum('ikj,ik...->ij...', wgt, phi)
        return lmbda, phi_one, Qmat_exp

    @staticmethod
    def _exp_term(f_exp, lmbda, u0, u):
        """f_exp + lambda (u0 - u): the node's exponential increment."""
        return f_exp + lmbda * (u0 - u)

    # -- protocol -------------------------------------------------------
    def integrate(self, state: LevelState, dt, t=0.0, prob=None):
        prob = prob if prob is not None else self.level.prob
        M = self.coll.num_nodes
        u0 = state.u[0]
        lmbda, _, Qmat_exp = self._lambda_phi_qmat(prob, u0, t, dt)
        Q = self.coll.q
        base = _tensordot_nodes(Q, state.f.impl[1:] + state.f.expl[1:])
        QQ = jnp.stack(
            [self._exp_term(state.f.exp[j + 1], lmbda, u0, state.u[j + 1]) for j in range(M)]
        )
        exp_part = jnp.einsum('ij...,j...->i...', Qmat_exp, QQ)
        return dt * (base + exp_part)

    def compute_residual(self, state: LevelState, dt, residual_type='full_abs', t=0.0):
        from pysdc_tpu.core.state import norm_max
        from pysdc_tpu.core.errors import ParameterError

        res = self.integrate(state, dt, t=t) + state.tau + state.u[0][None] - state.u[1:]
        node_norms = jnp.stack([norm_max(res[m]) for m in range(res.shape[0])])
        if residual_type == 'full_abs':
            norm = jnp.max(node_norms)
        elif residual_type == 'last_abs':
            norm = node_norms[-1]
        elif residual_type == 'full_rel':
            norm = jnp.max(node_norms) / norm_max(state.u[0])
        elif residual_type == 'last_rel':
            norm = node_norms[-1] / norm_max(state.u[0])
        else:
            raise ParameterError(f'residual_type = {residual_type} not implemented')
        return res, norm

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        ts = self.node_times(t, dt)
        u0 = state.u[0]
        lmbda, phi_one, _ = self._lambda_phi_qmat(prob, u0, t, dt)

        integral = self.integrate(state, dt, t=t, prob=prob) + state.tau
        # node-to-node increments
        integral = jnp.concatenate([integral[:1], integral[1:] - integral[:-1]], axis=0)
        # subtract the old iterate's preconditioner terms (reference :183-196)
        prep = []
        for m in range(M):
            term = integral[m]
            term = term - dt * self.delta[m] * state.f.impl[m + 1]
            term = term - dt * self.delta[m] * state.f.expl[m]
            term = term - dt * self.delta[m] * phi_one[m] * self._exp_term(
                state.f.exp[m], lmbda, u0, state.u[m]
            )
            prep.append(term)

        u_list = [state.u[m] for m in range(M + 1)]
        f_list = [
            IMEXEXP(
                impl=state.f.impl[m], expl=state.f.expl[m], exp=state.f.exp[m]
            )
            for m in range(M + 1)
        ]
        for m in range(M):
            tmp = u_list[m] + prep[m]
            tmp = tmp + dt * self.delta[m] * phi_one[m] * self._exp_term(
                f_list[m].exp, lmbda, u0, u_list[m]
            )
            tmp = tmp + dt * self.delta[m] * f_list[m].expl
            u_list[m + 1] = prob.solve_system(tmp, dt * float(self.QI[m + 1, m + 1]), u_list[m + 1], ts[m])
            f_list[m + 1] = prob.eval_f(u_list[m + 1], ts[m])

        u = jnp.stack(u_list, axis=0)
        f = IMEXEXP(
            impl=jnp.stack([fm.impl for fm in f_list], 0),
            expl=jnp.stack([fm.expl for fm in f_list], 0),
            exp=jnp.stack([fm.exp for fm in f_list], 0),
        )
        return LevelState(u=u, f=f, tau=state.tau)

    def compute_end_point(self, state: LevelState, t, dt):
        if self.coll.right_is_node and not self.do_coll_update:
            return state.u[-1]
        raise NotImplementedError('ESDC requires right_is_node quadrature')
