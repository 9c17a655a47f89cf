"""2D Brusselator reaction-diffusion benchmark (Hairer-Wanner).

Counterpart of the reference ``Brusselator``
(``implementations/problem_classes/Brusselator.py``):

    u_t = alpha Lap(u) + 1 + u^2 v - 4.4 u + f(x, y, t)
    v_t = alpha Lap(v) + 3.4 u - u^2 v

on the periodic unit square, with the localized source f = 5 inside a
disk around (0.3, 0.6) for t >= 1.1.  Diffusion implicit (spectral),
reaction + source explicit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.linop import SpectralOperator


class Brusselator(Problem):
    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), alpha=0.1, dtype=None):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=(2,) + nvars, dtype=dtype)
        self._register(nvars=nvars, alpha=alpha)
        self.lap = SpectralOperator(nvars, lengths=(1.0,) * len(nvars), scale=alpha)
        x = np.arange(nvars[0]) / nvars[0]
        self.X, self.Y = np.meshgrid(x, x, indexing='ij')
        self.work_counters['rhs'] = WorkCounter()

    def _source(self, t):
        mask = jnp.asarray((self.X - 0.3) ** 2 + (self.Y - 0.6) ** 2 <= 0.1**2, self.dtype)
        return jnp.where(t >= 1.1, 5.0 * mask, 0.0 * mask)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.stack([self.lap.apply(u[0]), self.lap.apply(u[1])])
        ru = 1.0 + u[0] ** 2 * u[1] - 4.4 * u[0] + self._source(t)
        rv = 3.4 * u[0] - u[0] ** 2 * u[1]
        return IMEX(impl=impl, expl=jnp.stack([ru, rv]))

    def solve_system(self, rhs, factor, u0, t):
        su = self.lap.solve_shifted(rhs[0], factor)
        sv = self.lap.solve_shifted(rhs[1], factor)
        return jnp.stack([su, sv])

    def u_exact(self, t, u_init=None, t_init=None):
        if float(t) != 0.0:
            raise NotImplementedError('initial condition only')
        X, Y = jnp.asarray(self.X), jnp.asarray(self.Y)
        u = 22.0 * Y * (1 - Y) ** 1.5
        v = 27.0 * X * (1 - X) ** 1.5
        return jnp.stack([u, v]).astype(self.dtype)
