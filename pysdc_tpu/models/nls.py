"""Nonlinear Schrödinger equation, ND periodic spectral, IMEX and fully
implicit variants.

Counterpart of the reference ``nonlinearschroedinger_imex`` /
``nonlinearschroedinger_fully_implicit``
(``implementations/problem_classes/NonlinearSchroedinger_MPIFFT.py``):

    u_t = i Lap(u) + 2 c i N |u|^2 u     on [0, 2*pi]^N

with the exact (Akhmediev-breather-type) solution evaluated along the
diagonal, u(x, t) = u_1D(N*t, sum_d x_d).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ProblemError
from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.linop import SpectralOperator


class NonlinearSchroedinger(Problem):
    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), c=1.0, dtype=None):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        if c not in (0.0, 1.0):
            raise ProblemError(f'Setup not implemented, c has to be 0 or 1, got {c}')
        super().__init__(shape=nvars, dtype=dtype if dtype is not None else jnp.complex128)
        self._register(nvars=nvars, c=c, L=2 * np.pi)
        self.lap = SpectralOperator(nvars, lengths=(self.L,) * len(nvars), scale=1.0)
        dx = self.L / nvars[0]
        self.xvalues = np.arange(nvars[0]) * dx
        self.work_counters['rhs'] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    @property
    def grids(self):
        x = jnp.asarray(self.xvalues)
        return jnp.meshgrid(*([x] * self.ndim), indexing='ij')

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = 1j * self.lap.apply(u)
        expl = self.ndim * self.c * 2j * jnp.abs(u) ** 2 * u
        return IMEX(impl=impl, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        """(I - factor*i*Lap) u = rhs, exact in Fourier space."""
        axes = tuple(range(rhs.ndim - self.ndim, rhs.ndim))
        rhat = jnp.fft.fftn(rhs, axes=axes)
        xhat = rhat / (1.0 - factor * 1j * jnp.asarray(self.lap.symbol))
        return jnp.fft.ifftn(xhat, axes=axes).astype(rhs.dtype)

    def _exact_1d(self, t, x):
        if self.c == 0:
            return jnp.sin(x) * jnp.exp(-1j * t)
        ae = 1.0 / np.sqrt(2.0) * jnp.exp(1j * t)
        return ae * ((jnp.cosh(t) + 1j * jnp.sinh(t)) / (jnp.cosh(t) - 1.0 / np.sqrt(2.0) * jnp.cos(x)) - 1.0)

    def u_exact(self, t, u_init=None, t_init=None):
        xsum = sum(self.grids) if self.ndim > 1 else self.grids[0] if isinstance(self.grids, (list, tuple)) else self.grids
        return self._exact_1d(self.ndim * t, xsum).astype(self.dtype)
