"""N-dimensional advection equation, finite differences.

Counterpart of the reference ``advectionNd``
(``implementations/problem_classes/AdvectionEquation_ND_FD.py``): periodic
upwind/center stencils, exact solution by translation of the initial data.
The circulant direct solve handles the (complex-symbol) shifted systems
exactly via FFT.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.ops.fd import get_1d_grid
from pysdc_tpu.ops.linop import SeparableFDOperator


class AdvectionND(Problem):
    """u_t = -c * sum_d du/dx_d with periodic BCs."""

    def __init__(
        self,
        nvars=512,
        c=1.0,
        freq=2,
        stencil_type='center',
        order=2,
        lintol=1e-12,
        liniter=10000,
        solver_type='direct',
        backend='eigen',
        dtype=None,
    ):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        freq = (freq,) * len(nvars) if isinstance(freq, int) else tuple(freq)
        super().__init__(shape=nvars, dtype=dtype)

        dx, xvals = get_1d_grid(nvars[0], 'periodic')
        per_dim = [
            dict(size=n, dx=dx, derivative=1, order=order, stencil_type=stencil_type, bc='periodic')
            for n in nvars
        ]
        if backend == 'sparse':
            from pysdc_tpu.ops.sparse_op import SparseFDOperator

            self.A = SparseFDOperator(per_dim, scale=-c)
        else:
            self.A = SeparableFDOperator(per_dim, scale=-c)
        self._register(
            nvars=nvars, c=c, freq=freq, order=order, stencil_type=stencil_type,
            lintol=lintol, liniter=liniter, solver_type=solver_type, dx=dx, backend=backend,
        )
        self.xvals = xvals
        self.work_counters['rhs'] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    @property
    def grids(self):
        x = jnp.asarray(self.xvals, self.dtype)
        if self.ndim == 1:
            return x
        return jnp.meshgrid(*([x] * self.ndim), indexing='ij')

    @property
    def diagonalizable_operator(self):
        """Linear autonomous f = A@u: fused diagonal-basis multi-sweeps apply
        (ops/diag_sdc.py); direct eigen solver only, see HeatND."""
        if self.backend != 'eigen':
            return None
        return self.A if self.solver_type == 'direct' else None

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u)

    def solve_system(self, rhs, factor, u0, t):
        if self.solver_type == 'direct':
            return self.A.solve_shifted(rhs, factor)
        if self.solver_type == 'GMRES':
            return self.A.solve_shifted_gmres(rhs, factor, u0, tol=self.lintol, maxiter=self.liniter)
        return self.A.solve_shifted_cg(rhs, factor, u0, tol=self.lintol, maxiter=self.liniter)

    def u_exact(self, t, u_init=None, t_init=0.0):
        """Initial sine product translated by c*(t - t_init) in each dim."""
        shift = self.c * (t - t_init)
        if self.ndim == 1:
            x = self.grids
            return jnp.sin(np.pi * self.freq[0] * (x - shift))
        out = jnp.ones(self.shape, self.dtype)
        gs = self.grids
        for d in range(self.ndim):
            out = out * jnp.sin(np.pi * self.freq[d] * (gs[d] - shift))
        return out
