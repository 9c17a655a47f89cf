"""N-dimensional heat equation, finite differences.

Counterpart of the reference ``heatNd_unforced`` / ``heatNd_forced``
(``pySDC/implementations/problem_classes/HeatEquation_ND_FD.py``) on the
TPU-native operator layer: the Laplacian is a separable stencil operator with
FFT (periodic) or eigen-matmul (Dirichlet/Neumann) *direct* shifted solves —
no sparse LU, no factorization cache, dt stays traced.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.fd import get_1d_grid
from pysdc_tpu.ops.linop import SeparableFDOperator


class HeatND(Problem):
    """u_t = nu * Laplace(u); params follow the reference problem class."""

    def __init__(
        self,
        nvars=512,
        nu=0.1,
        freq=2,
        stencil_type='center',
        order=2,
        lintol=1e-12,
        liniter=10000,
        solver_type='direct',
        bc='periodic',
        sigma=6e-2,
        backend='eigen',
        dtype=None,
    ):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        freq = (freq,) * len(nvars) if isinstance(freq, int) else tuple(freq)
        if len(nvars) > 1 and len(set(nvars)) > 1:
            raise ValueError('need identical nvars for each dimension')
        super().__init__(shape=nvars, dtype=dtype)

        dx, xvals = get_1d_grid(nvars[0], bc)
        per_dim = [
            dict(size=n, dx=dx, derivative=2, order=order, stencil_type=stencil_type, bc=bc)
            for n in nvars
        ]
        if backend == 'sparse':
            # north-star path: assembled CSR + structured factorization;
            # the separable eigen twin rides along as the exact spectral
            # preconditioner so large 2D grids take the PCG lane (one
            # iteration — the surrogate IS the operator)
            from pysdc_tpu.ops.sparse_op import SparseFDOperator

            self.A = SparseFDOperator(per_dim, scale=nu,
                                      precond=SeparableFDOperator(per_dim, scale=nu))
        else:
            self.A = SeparableFDOperator(per_dim, scale=nu)
        self._register(
            nvars=nvars, nu=nu, freq=freq, order=order, stencil_type=stencil_type,
            lintol=lintol, liniter=liniter, solver_type=solver_type, bc=bc, sigma=sigma, dx=dx,
            backend=backend,
        )
        self.xvals = xvals
        self.work_counters['rhs'] = WorkCounter()
        if solver_type != 'direct':
            self.work_counters[solver_type] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    @property
    def diagonalizable_operator(self):
        """eval_f is exactly A@u and solves are exact diagonal-basis solves,
        so multi-sweep SDC may run fused in the basis (ops/diag_sdc.py).
        Only for the direct eigen solver (iterative paths must match the
        reference's solver_type semantics, work counters included)."""
        if self.backend != 'eigen':
            return None
        return self.A if self.solver_type == 'direct' else None

    @property
    def grids(self):
        """ND meshgrid tuple (matches reference generic_ND_FD.grids)."""
        x = jnp.asarray(self.xvals, self.dtype)
        if self.ndim == 1:
            return x
        return jnp.meshgrid(*([x] * self.ndim), indexing='ij')

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u)

    def solve_system(self, rhs, factor, u0, t, node=None):
        if self.solver_type == 'direct':
            if node is not None and self.backend == 'sparse':
                return self.A.solve_shifted(rhs, factor, node=node)
            return self.A.solve_shifted(rhs, factor)
        if self.solver_type == 'CG':
            self.work_counters['CG']()
            return self.A.solve_shifted_cg(rhs, factor, u0, tol=self.lintol, maxiter=self.liniter)
        if self.solver_type == 'GMRES':
            self.work_counters['GMRES']()
            return self.A.solve_shifted_gmres(rhs, factor, u0, tol=self.lintol, maxiter=self.liniter)
        raise ValueError(f'unknown solver_type {self.solver_type!r}')

    def _sin_product(self):
        # float(): numpy scalars are strong-typed in JAX and would promote
        # float32 states to float64 under x64
        if self.ndim == 1:
            x = self.grids
            return jnp.sin(float(np.pi * self.freq[0]) * x)
        gs = self.grids
        out = jnp.ones(self.shape, self.dtype)
        for d in range(self.ndim):
            out = out * jnp.sin(float(np.pi * self.freq[d]) * gs[d])
        return out

    def _rho(self):
        """Discrete decay rate of the FD Laplacian on the initial mode
        (reference HeatEquation_ND_FD.py:105-123, 2nd-order only)."""
        dx = self.dx
        return float(sum((2.0 - 2.0 * np.cos(np.pi * f * dx)) / dx**2 for f in self.freq))

    def u_exact(self, t, u_init=None, t_init=None):
        if self.ndim == 1 and self.freq[0] == -1:
            x = self.grids
            out = jnp.exp(-0.5 * ((x - 0.5) / self.sigma) ** 2) * jnp.exp(-t * self.nu * self._rho())
        else:
            out = self._sin_product() * jnp.exp(-t * self.nu * self._rho())
        return out.astype(self.dtype)


class HeatNDForced(HeatND):
    """IMEX-split forced heat equation; exact solution sin-product * cos(t)
    (reference ``heatNd_forced``)."""

    f_kind = 'imex'

    #: forcing term makes f nonautonomous -> no fused diagonal sweeps
    diagonalizable_operator = None

    def __init__(self, nvars=512, nu=0.1, freq=2, stencil_type='center', order=2,
                 lintol=1e-12, liniter=10000, solver_type='direct', bc='periodic',
                 backend='eigen', dtype=None):
        super().__init__(nvars, nu, freq, stencil_type, order, lintol, liniter, solver_type, bc,
                         backend=backend, dtype=dtype)

    def _forcing(self, t):
        k2 = sum(f**2 for f in self.freq)
        return self._sin_product() * (self.nu * np.pi**2 * k2 * jnp.cos(t) - jnp.sin(t))

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return IMEX(impl=self.A.apply(u), expl=self._forcing(t))

    def u_exact(self, t, u_init=None, t_init=None):
        return self._sin_product() * jnp.cos(t)
