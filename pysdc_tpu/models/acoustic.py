"""1D acoustic-advection (fast-wave slow-wave) problem, IMEX.

Counterpart of the reference ``acoustic_1d_imex``
(implementations/problem_classes/AcousticAdvection_1D_FD_imex.py) and the
FastWaveSlowWave project: u = (p, v) on a periodic interval with

    p_t + c_adv p_x + c_s v_x = 0
    v_t + c_adv v_x + c_s p_x = 0

the stiff sound waves (c_s) implicit and the slow advection (c_adv)
explicit.  Spectral derivatives; the per-mode 2x2 implicit systems invert in
closed form.  Exact solution by characteristics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX


class AcousticAdvection1D(Problem):
    f_kind = 'imex'

    def __init__(self, nvars=512, cs=0.5, cadv=0.1, waveno=5, dtype=None):
        super().__init__(shape=(2, nvars), dtype=dtype)
        self._register(nvars=nvars, cs=cs, cadv=cadv, waveno=waveno)
        self.k = jnp.asarray(2 * np.pi * np.fft.fftfreq(nvars, d=1.0 / nvars))
        self.xvalues = np.arange(nvars) / nvars
        self.work_counters['rhs'] = WorkCounter()

    @property
    def mesh(self):
        return jnp.asarray(self.xvalues, self.dtype)

    def _dx(self, u):
        return jnp.real(jnp.fft.ifft(1j * self.k * jnp.fft.fft(u))).astype(u.dtype)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        p, v = u[0], u[1]
        impl = jnp.stack([-self.cs * self._dx(v), -self.cs * self._dx(p)])
        expl = jnp.stack([-self.cadv * self._dx(p), -self.cadv * self._dx(v)])
        return IMEX(impl=impl, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        """(I + factor*cs*Dx_swap) solved per Fourier mode in closed form."""
        p_hat = jnp.fft.fft(rhs[0])
        v_hat = jnp.fft.fft(rhs[1])
        a = factor * self.cs * 1j * self.k
        det = 1.0 - a**2
        p_new = (p_hat - a * v_hat) / det
        v_new = (v_hat - a * p_hat) / det
        return jnp.stack(
            [jnp.real(jnp.fft.ifft(p_new)), jnp.real(jnp.fft.ifft(v_new))]
        ).astype(rhs.dtype)

    def u_exact(self, t, u_init=None, t_init=None):
        """d'Alembert characteristics (reference :195-222)."""

        def u_initial(x, k):
            return jnp.sin(k * 2.0 * np.pi * x) + jnp.sin(2.0 * np.pi * x)

        x = self.mesh
        k = self.waveno
        fast = u_initial(x - (self.cadv + self.cs) * t, k)
        slow = u_initial(x - (self.cadv - self.cs) * t, k)
        p = 0.5 * fast - 0.5 * slow
        v = 0.5 * fast + 0.5 * slow
        return jnp.stack([p, v]).astype(self.dtype)
