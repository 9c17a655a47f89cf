"""Generalized Fisher equation: traveling-wave reaction-diffusion.

Counterpart of the reference ``GeneralizedFisher_1D_FD_implicit``
(``implementations/problem_classes/GeneralizedFisher_1D_FD_implicit.py``):
u_t = u_xx + lambda0^2 u (1 - u^nu) on (-5, 5) with time-dependent Dirichlet
boundary values from the exact traveling wave.  Fully implicit via the
shared Newton-Krylov solver with the exact diffusion solve as preconditioner.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.ops.linop import SeparableFDOperator
from pysdc_tpu.ops.solvers import newton_pde


class GeneralizedFisher1D(Problem):
    def __init__(self, nvars=127, nu=1.0, lambda0=2.0, newton_maxiter=100, newton_tol=1e-12,
                 interval=(-5.0, 5.0), dtype=None):
        if (nvars + 1) % 2:
            raise ValueError('setup requires nvars = 2^p - 1')
        super().__init__(shape=(nvars,), dtype=dtype)
        dx = (interval[1] - interval[0]) / (nvars + 1)
        self._register(nvars=(nvars,), nu=nu, lambda0=lambda0, newton_maxiter=newton_maxiter,
                       newton_tol=newton_tol, interval=interval, dx=dx)
        self.xvalues = np.array([(i + 1 - (nvars + 1) / 2) * dx for i in range(nvars)])
        self.A = SeparableFDOperator([dict(size=nvars, dx=dx, derivative=2, order=2, bc='dirichlet-zero')])
        # traveling-wave parameters (reference :143-150)
        self.lam1 = lambda0 / 2.0 * ((nu / 2.0 + 1) ** 0.5 + (nu / 2.0 + 1) ** (-0.5))
        self.sig1 = self.lam1 - np.sqrt(self.lam1**2 - lambda0**2)
        self.work_counters['rhs'] = WorkCounter()
        self.work_counters['newton'] = WorkCounter()

    def _wave(self, x, t):
        return (
            1 + (2 ** (self.nu / 2.0) - 1) * jnp.exp(-self.nu / 2.0 * self.sig1 * (x + 2 * self.lam1 * t))
        ) ** (-2.0 / self.nu)

    def _bc_term(self, t):
        ul = self._wave(self.interval[0], t)
        ur = self._wave(self.interval[1], t)
        out = jnp.zeros(self.shape, self.dtype)
        return out.at[0].set(ul / self.dx**2).at[-1].set(ur / self.dx**2)

    def _reaction(self, u):
        return self.lambda0**2 * u * (1.0 - jnp.abs(u) ** self.nu)

    def _reaction_prime(self, u):
        return self.lambda0**2 * (1.0 - (self.nu + 1) * jnp.abs(u) ** self.nu)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u) + self._bc_term(t) + self._reaction(u)

    def solve_system(self, rhs, factor, u0, t):
        self.work_counters['newton']()
        bc = self._bc_term(t)
        return newton_pde(
            self.A.apply, self.A.solve_shifted,
            lambda u: self._reaction(u) + bc, self._reaction_prime,
            rhs, factor, u0, newton_tol=self.newton_tol, newton_maxiter=self.newton_maxiter,
        )

    def u_exact(self, t, u_init=None, t_init=None):
        return self._wave(jnp.asarray(self.xvalues), t).astype(self.dtype)
