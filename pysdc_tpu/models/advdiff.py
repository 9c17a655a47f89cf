"""1D advection-diffusion with IMEX splitting, spectral.

Counterpart of the reference ``AdvectionDiffusionEquation_1D_FFT``
(implementations/problem_classes): u_t + c u_x = nu u_xx on a periodic
interval; stiff diffusion implicit, advection explicit.  Exact solution by
Fourier-mode decay + translation.  This is BASELINE config #2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.linop import SpectralOperator


class AdvectionDiffusion1D(Problem):
    f_kind = 'imex'

    def __init__(self, nvars=256, c=1.0, nu=0.02, freq=2, L=1.0, dtype=None):
        super().__init__(shape=(nvars,), dtype=dtype)
        self._register(nvars=nvars, c=c, nu=nu, freq=freq, L=L)
        self.lap = SpectralOperator((nvars,), lengths=(L,), scale=nu)
        self.ddx = SpectralOperator(
            (nvars,), lengths=(L,), symbol_fn=lambda k: 1j * k, scale=-c
        )
        self.xvalues = np.arange(nvars) * L / nvars
        self.work_counters['rhs'] = WorkCounter()

    @property
    def grid(self):
        return jnp.asarray(self.xvalues, self.dtype)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return IMEX(impl=self.lap.apply(u), expl=self.ddx.apply(u))

    def solve_system(self, rhs, factor, u0, t):
        return self.lap.solve_shifted(rhs, factor)

    def u_exact(self, t, u_init=None, t_init=0.0):
        k = 2 * np.pi * self.freq / self.L
        x = self.grid
        return (jnp.sin(k * (x - self.c * t)) * jnp.exp(-t * self.nu * k**2)).astype(self.dtype)
