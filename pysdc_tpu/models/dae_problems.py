"""DAE problems F(u, u', t) = 0.

Counterparts of the reference DAE project problems
(projects/DAE/problems/simpleDAE.py, pendulum2D.py and the ProblemDAE base
in projects/DAE/misc/problemDAE.py).  The node solves run a traced Newton
(jacfwd) on the flattened implicit system.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.models.odes import newton_solve


class DAEProblem(Problem):
    """Base: subclasses implement eval_f(u, du, t) -> residual array."""

    #: number of leading differential components (rest are algebraic)
    diff_nvars: int = None

    def __init__(self, nvars, newton_tol=1e-10, newton_maxiter=100, dtype=None):
        super().__init__(shape=(nvars,), dtype=dtype)
        self._register(nvars=nvars, newton_tol=newton_tol, newton_maxiter=newton_maxiter)
        self.work_counters['rhs'] = WorkCounter()
        self.work_counters['newton'] = WorkCounter()

    def eval_f(self, u, du, t):
        raise NotImplementedError

    def solve_system_dae(self, u_approx, factor, du0, t):
        """Solve 0 = F(u_approx + factor*du, du, t) for du (fully implicit;
        reference problemDAE.py:39-80 uses scipy.optimize.root instead)."""
        self.work_counters['newton']()

        def G(du):
            return self.eval_f(u_approx + factor * du, du, t)

        # newton_solve solves u - factor*f(u) = rhs; reuse its machinery by
        # passing f(du) = du - G(du) and rhs = 0 with factor 1:
        return newton_solve(lambda du: du - G(du), jnp.zeros_like(du0), 1.0, du0,
                            self.newton_tol, self.newton_maxiter)

    def solve_system_dae_semi(self, u_approx, factor, w0, t):
        """Semi-explicit solve: unknowns are the differential derivatives and
        the algebraic variables (reference semiImplicitDAE.py)."""
        self.work_counters['newton']()
        nd = self.diff_nvars

        def G(w):
            u_cand = u_approx.at[:nd].add(factor * w[:nd]).at[nd:].set(w[nd:])
            du_cand = w.at[nd:].set(0.0)
            return self.eval_f(u_cand, du_cand, t)

        return newton_solve(lambda w: w - G(w), jnp.zeros_like(w0), 1.0, w0,
                            self.newton_tol, self.newton_maxiter)


class SimpleDAE(DAEProblem):
    """Smooth linear index-2 DAE with known solution (Ascher & Petzold,
    reference simpleDAE.py): u = (exp(t), exp(t)), z = -exp(t)/(2-t)."""

    diff_nvars = 2

    def __init__(self, newton_tol=1e-10, dtype=None):
        super().__init__(nvars=3, newton_tol=newton_tol, dtype=dtype)
        self.a = 10.0

    def eval_f(self, u, du, t):
        a = self.a
        et = jnp.exp(t)
        return jnp.stack(
            [
                -du[0] + (a - 1 / (2 - t)) * u[0] + (2 - t) * a * u[2] + (3 - t) / (2 - t) * et,
                -du[1] + (1 - a) / (t - 2) * u[0] - u[1] + (a - 1) * u[2] + 2 * et,
                (t + 2) * u[0] + (t**2 - 4) * u[1] - (t**2 + t - 2) * et,
            ]
        )

    def u_exact(self, t, u_init=None, t_init=None):
        et = jnp.exp(t)
        return jnp.stack([et, et, -et / (2 - t)]).astype(self.dtype)

    def du_exact(self, t):
        et = jnp.exp(t)
        return jnp.stack([et, et, -et * (3 - t) / (2 - t) ** 2]).astype(self.dtype)


class Pendulum2D(DAEProblem):
    """Index-3 planar pendulum (reference pendulum2D.py):
    u = (x, y, vx, vy, lambda); constraint x^2 + y^2 = 1."""

    diff_nvars = 4
    g = 9.8

    def __init__(self, newton_tol=1e-10, dtype=None):
        super().__init__(nvars=5, newton_tol=newton_tol, dtype=dtype)

    def eval_f(self, u, du, t):
        x, y, vx, vy, lam = u[0], u[1], u[2], u[3], u[4]
        return jnp.stack(
            [
                du[0] - vx,
                du[1] - vy,
                du[2] + x * lam,
                du[3] + y * lam + self.g,
                x**2 + y**2 - 1.0,
            ]
        )

    def u_exact(self, t, u_init=None, t_init=None):
        if float(t) != 0.0:
            raise NotImplementedError('initial condition only')
        return jnp.asarray([-1.0, 0.0, 0.0, 0.0, 0.0], self.dtype)
