"""Variable-coefficient diffusion — the sparse layer's flagship problem.

``u_t = d/dx (a(x) du/dx) [+ d/dy (a(x,y) du/dy)] + f`` with a genuinely
non-separable operator: no tensor-product eigendecomposition exists, so the
eigen/FFT fast path (:mod:`pysdc_tpu.ops.linop`) cannot represent it.  This
problem runs entirely on the from-scratch sparse stack: conservative
face-coefficient assembly into CSR (:mod:`pysdc_tpu.ops.sparse`), ELL/BSR
SpMV for ``eval_f``, and structured factorization (Thomas / cyclic Thomas /
block Thomas) for the shifted solves (:mod:`pysdc_tpu.ops.banded`).

The reference covers this class of operator through ``GenericNDimFinDiff``
with scipy CSR + splu (``generic_ND_FD.py:17-240``); there is no exact
reference twin — constant-coefficient limits are cross-gated against
:class:`~pysdc_tpu.models.heat.HeatND` in ``tests/test_sparse.py``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.sparse import CSR
from pysdc_tpu.ops.sparse_op import SparseOperator, variable_diffusion_matrix


class VarCoeffDiffusion1D(Problem):
    """1D conservative variable-coefficient diffusion, Dirichlet-0 or periodic.

    ``coeff_fn(x)`` gives the diffusivity at face centers.  Forced variant:
    with ``forcing=True`` the RHS carries an IMEX split with the source term
    chosen so ``u(x, t) = sin(pi k x) cos(t)`` is exact in the Dirichlet case
    with a ≡ nu (used by convergence gates).
    """

    def __init__(self, nvars=128, coeff_fn=None, nu=1.0, freq=2, bc='dirichlet',
                 interval=(0.0, 1.0), dtype=None):
        super().__init__(shape=(nvars,), dtype=dtype)
        L = interval[1] - interval[0]
        if bc == 'periodic':
            dx = L / nvars
            x = interval[0] + dx * np.arange(nvars)
            faces = x - 0.5 * dx  # face i sits between nodes i-1 and i
            a_faces = np.concatenate([faces, [faces[0] + L]])
        else:
            dx = L / (nvars + 1)
            x = interval[0] + dx * np.arange(1, nvars + 1)
            a_faces = x[0] - 0.5 * dx + dx * np.arange(nvars + 1)
        coeff_fn = coeff_fn if coeff_fn is not None else (lambda xx: nu * np.ones_like(xx))
        a_vals = np.asarray(coeff_fn(a_faces), dtype=float)
        A = variable_diffusion_matrix(a_vals, dx, bc=bc)
        self.A = SparseOperator(A, grid_shape=(nvars,))
        self.xvals = x
        self._register(nvars=nvars, nu=nu, freq=freq, bc=bc, interval=interval, dx=dx)
        self.work_counters['rhs'] = WorkCounter()

    @property
    def grids(self):
        return jnp.asarray(self.xvals, self.dtype)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u)

    def solve_system(self, rhs, factor, u0, t, node=None):
        return self.A.solve_shifted(rhs, factor, x0=u0, node=node)


class VarCoeffDiffusion2D(Problem):
    """2D conservative variable-coefficient diffusion with Dirichlet-0 BCs.

    Face-centered diffusivities from ``coeff_fn(x, y)``; the operator is a
    five-point stencil with spatially varying weights — block-tridiagonal by
    grid lines, solved direct by block Thomas on the MXU.
    """

    def __init__(self, nvars=(32, 32), coeff_fn=None, nu=1.0, dtype=None, solver='auto'):
        nvars = (nvars, nvars) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=nvars, dtype=dtype)
        nx, ny = nvars
        dx = 1.0 / (nx + 1)
        dy = 1.0 / (ny + 1)
        x = dx * np.arange(1, nx + 1)
        y = dy * np.arange(1, ny + 1)
        coeff_fn = coeff_fn if coeff_fn is not None else (lambda xx, yy: nu * np.ones_like(xx))

        # face coefficients
        xf = dx * (np.arange(nx + 1) + 0.5)   # x-faces between rows i-1, i
        yf = dy * (np.arange(ny + 1) + 0.5)
        ax = np.asarray(coeff_fn(xf[:, None], y[None, :]), dtype=float)   # (nx+1, ny)
        ay = np.asarray(coeff_fn(x[:, None], yf[None, :]), dtype=float)   # (nx, ny+1)

        n = nx * ny
        idx = np.arange(n).reshape(nx, ny)
        rows, cols, vals = [], [], []

        def add(r, c, v):
            rows.append(r.ravel()); cols.append(c.ravel()); vals.append(v.ravel())

        # x-direction: (a_{i+1/2}(u_{i+1}-u_i) - a_{i-1/2}(u_i-u_{i-1}))/dx^2
        add(idx, idx, -(ax[1:, :] + ax[:-1, :]) / dx**2)
        add(idx[1:, :], idx[:-1, :], ax[1:-1, :] / dx**2)   # u_{i-1} in row i
        add(idx[:-1, :], idx[1:, :], ax[1:-1, :] / dx**2)   # u_{i+1} in row i
        # y-direction
        add(idx, idx, -(ay[:, 1:] + ay[:, :-1]) / dy**2)
        add(idx[:, 1:], idx[:, :-1], ay[:, 1:-1] / dy**2)
        add(idx[:, :-1], idx[:, 1:], ay[:, 1:-1] / dy**2)

        A = CSR.from_coo(np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), (n, n))
        # nearest separable surrogate mean(a_x) d_xx + mean(a_y) d_yy as the
        # spectral preconditioner for the large-grid PCG lane; the per-dim
        # coefficient folds into the eigen operator through dx -> dx/sqrt(a)
        from pysdc_tpu.ops.linop import SeparableFDOperator

        precond = SeparableFDOperator(
            [
                dict(size=nx, dx=dx / np.sqrt(ax.mean()), derivative=2, order=2, bc='dirichlet'),
                dict(size=ny, dx=dy / np.sqrt(ay.mean()), derivative=2, order=2, bc='dirichlet'),
            ]
        )
        self.A = SparseOperator(A, grid_shape=nvars, block=ny, precond=precond, solver=solver)
        self.xvals, self.yvals = x, y
        self._register(nvars=nvars, nu=nu, dx=dx, dy=dy)
        self.work_counters['rhs'] = WorkCounter()

    @property
    def grids(self):
        return jnp.meshgrid(jnp.asarray(self.xvals, self.dtype),
                            jnp.asarray(self.yvals, self.dtype), indexing='ij')

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u)

    def solve_system(self, rhs, factor, u0, t, node=None):
        # warm start: the previous sweep's node value cuts the Krylov depth
        return self.A.solve_shifted(rhs, factor, x0=u0, node=node)


class VarCoeffDiffusionForced1D(VarCoeffDiffusion1D):
    """IMEX forced variant with a known exact solution for order gates:
    with constant a ≡ nu, ``u = sin(pi k x) cos(t)`` solves
    ``u_t = nu u_xx + f`` for ``f = sin(pi k x)(nu (pi k)^2 cos t - sin t)``.
    Works with variable coefficients too (forcing then computed from the
    discrete operator so the semi-discrete solution is exact)."""

    f_kind = 'imex'

    def __init__(self, nvars=128, coeff_fn=None, nu=1.0, freq=2, dtype=None):
        super().__init__(nvars=nvars, coeff_fn=coeff_fn, nu=nu, freq=freq, bc='dirichlet', dtype=dtype)
        x = self.xvals
        self._mode = jnp.asarray(np.sin(np.pi * freq * x), self.dtype)
        # discrete forcing: u_t - A u for u = mode * cos(t)
        self._Amode = self.A.apply(self._mode)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        forcing = -self._mode * jnp.sin(t) - self._Amode * jnp.cos(t)
        return IMEX(impl=self.A.apply(u), expl=forcing)

    def solve_system(self, rhs, factor, u0, t, node=None):
        return self.A.solve_shifted(rhs, factor, node=node)

    def u_exact(self, t, u_init=None, t_init=None):
        return self._mode * jnp.cos(t)
