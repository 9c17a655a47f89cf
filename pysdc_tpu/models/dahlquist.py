"""Dahlquist test equation u' = lambda * u, batched over many lambdas.

Counterpart of the reference ``testequation0d`` / ``test_equation_IMEX``
(``pySDC/implementations/problem_classes/TestEquation_0D.py``): the state
vector holds one entry per lambda, so a whole stability-region scan is one
SDC run.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX


class Dahlquist(Problem):
    """params: lambdas (array-like, may be complex), u0 (scalar)."""

    def __init__(self, lambdas=None, u0=1.0, dtype=None):
        lambdas = np.asarray([-1.0] if lambdas is None else lambdas)
        if dtype is None:
            dtype = jnp.complex128 if np.iscomplexobj(lambdas) else None
        super().__init__(shape=lambdas.shape, dtype=dtype)
        self._register(lambdas=jnp.asarray(lambdas, self.dtype), u0=u0)
        self.work_counters['rhs'] = WorkCounter()

    def eval_f(self, u, t):
        return self.lambdas * u

    def solve_system(self, rhs, factor, u0, t):
        return rhs / (1.0 - factor * self.lambdas)

    def u_exact(self, t, u_init=None, t_init=0.0):
        u_init = self.u0 if u_init is None else u_init
        return u_init * jnp.exp((t - t_init) * self.lambdas) * jnp.ones(self.shape, self.dtype)


class DahlquistIMEX(Dahlquist):
    """IMEX split: ``u' = lambda_S * u + lambda_E * u``; the stiff part is
    implicit, matching the reference ``test_equation_IMEX``."""

    f_kind = 'imex'

    def __init__(self, lambdas_implicit=None, lambdas_explicit=None, u0=1.0, dtype=None):
        li = np.asarray([-1.0] if lambdas_implicit is None else lambdas_implicit)
        le = np.asarray(np.zeros_like(li) if lambdas_explicit is None else lambdas_explicit)
        if li.shape != le.shape:
            raise ValueError('lambdas_implicit and lambdas_explicit must have equal shapes')
        if dtype is None:
            dtype = jnp.complex128 if (np.iscomplexobj(li) or np.iscomplexobj(le)) else None
        Problem.__init__(self, shape=li.shape, dtype=dtype)
        self._register(
            lambdas=jnp.asarray(li + le),
            lambdas_implicit=jnp.asarray(li, self.dtype),
            lambdas_explicit=jnp.asarray(le, self.dtype),
            u0=u0,
        )
        self.work_counters['rhs'] = WorkCounter()

    def eval_f(self, u, t):
        return IMEX(impl=self.lambdas_implicit * u, expl=self.lambdas_explicit * u)

    def solve_system(self, rhs, factor, u0, t):
        return rhs / (1.0 - factor * self.lambdas_implicit)

    def u_exact(self, t, u_init=None, t_init=0.0):
        u_init = self.u0 if u_init is None else u_init
        lam = self.lambdas_implicit + self.lambdas_explicit
        return u_init * jnp.exp((t - t_init) * lam) * jnp.ones(self.shape, self.dtype)
