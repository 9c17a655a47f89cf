"""Allen-Cahn equation: 1D traveling front and ND periodic variants.

Counterparts of the reference's Allen-Cahn family
(``implementations/problem_classes/AllenCahn_1D_FD.py`` — fully implicit /
semi-implicit / multi-implicit front problems with driving force and exact
tanh front, and ``AllenCahn_2D_FD.py`` / ``AllenCahn_MPIFFT.py`` — periodic
circle problems).  Implicit nonlinear solves use the shared Newton-Krylov
machinery (``ops/solvers.py``) with the exact linear shifted solve as
preconditioner instead of per-problem scipy Newton loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ProblemError
from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import Comp2, IMEX
from pysdc_tpu.ops.linop import SeparableFDOperator
from pysdc_tpu.ops.solvers import newton_pde


class AllenCahnFront1D(Problem):
    """Fully-implicit 1D Allen-Cahn front with driving force.

    u_t = u_xx - 2/eps^2 u (1-u)(1-2u) - 6 dw u (1-u),
    inhomogeneous (time-dependent) Dirichlet BCs from the exact tanh front
    (reference AllenCahn_1D_FD.py:11-251).
    """

    def __init__(self, nvars=127, dw=-0.04, eps=0.04, newton_maxiter=100, newton_tol=1e-12,
                 interval=(-0.5, 0.5), stop_at_nan=True, dtype=None):
        if (nvars + 1) % 2:
            raise ProblemError('setup requires nvars = 2^p - 1')
        super().__init__(shape=(nvars,), dtype=dtype)
        dx = (interval[1] - interval[0]) / (nvars + 1)
        self._register(
            nvars=(nvars,), dw=dw, eps=eps, newton_maxiter=newton_maxiter, newton_tol=newton_tol,
            interval=interval, stop_at_nan=stop_at_nan, dx=dx,
        )
        self.xvalues = np.array([(i + 1 - (nvars + 1) / 2) * dx for i in range(nvars)])
        # interior Dirichlet-zero Laplacian; boundary values enter via _bc_term
        self.A = SeparableFDOperator([dict(size=nvars, dx=dx, derivative=2, order=2, bc='dirichlet-zero')])
        self.work_counters['newton'] = WorkCounter()
        self.work_counters['rhs'] = WorkCounter()

    # -- helpers --------------------------------------------------------
    def _front_speed(self):
        return 3.0 * np.sqrt(2) * self.eps * self.dw

    def _boundary_values(self, t):
        v = self._front_speed()
        left = 0.5 * (1 + jnp.tanh((self.interval[0] - v * t) / (np.sqrt(2) * self.eps)))
        right = 0.5 * (1 + jnp.tanh((self.interval[1] - v * t) / (np.sqrt(2) * self.eps)))
        return left, right

    def _bc_term(self, t):
        """Contribution of the inhomogeneous boundary values to A @ u."""
        left, right = self._boundary_values(t)
        out = jnp.zeros(self.shape, self.dtype)
        out = out.at[0].set(left / self.dx**2)
        out = out.at[-1].set(right / self.dx**2)
        return out

    def _reaction(self, u):
        eps2 = self.eps**2
        return -2.0 / eps2 * u * (1.0 - u) * (1.0 - 2.0 * u) - 6.0 * self.dw * u * (1.0 - u)

    def _reaction_prime(self, u):
        eps2 = self.eps**2
        d1 = -2.0 / eps2 * ((1.0 - u) * (1.0 - 2.0 * u) - u * ((1.0 - 2.0 * u) + 2.0 * (1.0 - u)))
        d2 = -6.0 * self.dw * ((1.0 - u) - u)
        return d1 + d2

    # -- protocol -------------------------------------------------------
    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u) + self._bc_term(t) + self._reaction(u)

    def solve_system(self, rhs, factor, u0, t):
        self.work_counters['newton']()
        bc = self._bc_term(t)
        return newton_pde(
            self.A.apply,
            self.A.solve_shifted,
            lambda u: self._reaction(u) + bc,  # constant BC term: zero Jacobian
            self._reaction_prime,
            rhs,
            factor,
            u0,
            newton_tol=self.newton_tol,
            newton_maxiter=self.newton_maxiter,
        )

    def u_exact(self, t, u_init=None, t_init=None):
        v = self._front_speed()
        return 0.5 * (1 + jnp.tanh((jnp.asarray(self.xvalues) - v * t) / (np.sqrt(2) * self.eps))).astype(self.dtype)


class AllenCahnFront1DSemiImplicit(AllenCahnFront1D):
    """IMEX split: Laplacian (+BC) implicit, reaction explicit
    (reference allencahn_front_semiimplicit, AllenCahn_1D_FD.py:253)."""

    f_kind = 'imex'

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return IMEX(impl=self.A.apply(u) + self._bc_term(t), expl=self._reaction(u))

    def solve_system(self, rhs, factor, u0, t):
        # (I - factor*A) u = rhs + factor*bc  (exact direct solve)
        return self.A.solve_shifted(rhs + factor * self._bc_term(t), factor)


class AllenCahnPeriodicND(Problem):
    """Periodic ND Allen-Cahn with shrinking-circle initial condition.

    u_t = Delta u - 2/eps^2 u (1-u)(1-2u); radius R(t) = sqrt(R0^2 - 2(d-1)t)
    (reference allencahn_periodic_* in AllenCahn_1D_FD.py / AllenCahn_2D_FD.py).
    Fully-implicit variant.
    """

    def __init__(self, nvars=(128, 128), eps=0.04, radius=0.25, newton_maxiter=100,
                 newton_tol=1e-12, interval=(-0.5, 0.5), backend='eigen', dtype=None):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=nvars, dtype=dtype)
        L = interval[1] - interval[0]
        dx = L / nvars[0]
        self._register(
            nvars=nvars, eps=eps, radius=radius, newton_maxiter=newton_maxiter,
            newton_tol=newton_tol, interval=interval, dx=dx, backend=backend,
        )
        self.xvalues = np.array([interval[0] + i * dx for i in range(nvars[0])])
        per_dim = [dict(size=n, dx=dx, derivative=2, order=2, bc='periodic') for n in nvars]
        if backend == 'sparse':
            # BASELINE config 3: assembled 5-point stencil, ELL/BSR SpMV;
            # periodic 1D solves use cyclic Thomas, ND periodic fall to CG
            from pysdc_tpu.ops.sparse_op import SparseFDOperator

            self.A = SparseFDOperator(per_dim)
        else:
            self.A = SeparableFDOperator(per_dim)
        self.work_counters['newton'] = WorkCounter()
        self.work_counters['rhs'] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    def _reaction(self, u):
        return -2.0 / self.eps**2 * u * (1.0 - u) * (1.0 - 2.0 * u)

    def _reaction_prime(self, u):
        return -2.0 / self.eps**2 * ((1.0 - u) * (1.0 - 2.0 * u) - u * (1.0 - 2.0 * u) - 2.0 * u * (1.0 - u))

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.A.apply(u) + self._reaction(u)

    def solve_system(self, rhs, factor, u0, t):
        self.work_counters['newton']()
        return newton_pde(
            self.A.apply, self.A.solve_shifted, self._reaction, self._reaction_prime,
            rhs, factor, u0, newton_tol=self.newton_tol, newton_maxiter=self.newton_maxiter,
        )

    def u_exact(self, t, u_init=None, t_init=0.0):
        """Sharp-interface circle of radius R(t) (initial condition for t=0;
        approximation for t > 0 used only as a qualitative reference)."""
        x = jnp.asarray(self.xvalues)
        grids = jnp.meshgrid(*([x] * self.ndim), indexing='ij')
        r2 = sum(g**2 for g in grids)
        radius = jnp.sqrt(jnp.maximum(self.radius**2 - 2.0 * (self.ndim - 1) * t, 0.0))
        return 0.5 * (1.0 + jnp.tanh((radius - jnp.sqrt(r2)) / (jnp.sqrt(2.0) * self.eps))).astype(self.dtype)


class AllenCahnPeriodicSemiImplicitND(AllenCahnPeriodicND):
    """IMEX variant: diffusion implicit, reaction explicit
    (reference allencahn_periodic_semiimplicit / allencahn_imex)."""

    f_kind = 'imex'

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return IMEX(impl=self.A.apply(u), expl=self._reaction(u))

    def solve_system(self, rhs, factor, u0, t):
        return self.A.solve_shifted(rhs, factor)


class AllenCahnPeriodicMultiImplicitND(AllenCahnPeriodicND):
    """Multi-implicit variant: diffusion and reaction both implicit but
    solved separately (reference allencahn_periodic_multiimplicit /
    AllenCahn_1D_FD.py multi-implicit classes; used with the multi-implicit
    sweeper's Q1/Q2 split)."""

    f_kind = 'comp2'

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return Comp2(comp1=self.A.apply(u), comp2=self._reaction(u))

    def solve_system(self, rhs, factor, u0, t):
        """Solve (I - factor*A) u = rhs (first component)."""
        return self.A.solve_shifted(rhs, factor)

    def solve_system_2(self, rhs, factor, u0, t):
        """Solve u - factor*reaction(u) = rhs pointwise via Newton."""
        self.work_counters['newton']()
        return newton_pde(
            lambda x: jnp.zeros_like(x), lambda r, c: r, self._reaction, self._reaction_prime,
            rhs, factor, u0, newton_tol=self.newton_tol, newton_maxiter=self.newton_maxiter,
        )


class AllenCahnFront1DFinel(AllenCahnFront1D):
    """Finel's discretization trick for the traveling front (reference
    ``allencahn_front_finel``, AllenCahn_1D_FD.py:333-477).

    The double-well term is replaced by the lattice-compatible form

        g'(u) = 1/dx^2 * [ (1-a) / (1 - a (2u-1)^2) - 1 ] * (2u-1),
        a = tanh(dx / (sqrt(2) eps))^2,

    which makes the discrete traveling wave exact on the grid (no velocity
    pinning).  Fully implicit; same Newton machinery as the base class with
    the closed-form derivative of Finel's potential.
    """

    def _finel_a2(self):
        return float(np.tanh(self.dx / (np.sqrt(2) * self.eps)) ** 2)

    def _reaction(self, u):
        a2 = self._finel_a2()
        w = 2.0 * u - 1.0
        gprim = ((1.0 - a2) / (1.0 - a2 * w**2) - 1.0) * w / self.dx**2
        return -gprim - 6.0 * self.dw * u * (1.0 - u)

    def _reaction_prime(self, u):
        a2 = self._finel_a2()
        w = 2.0 * u - 1.0
        ratio = (1.0 - a2) / (1.0 - a2 * w**2)
        dgprim = (2.0 * (ratio - 1.0) + w**2 * (1.0 - a2) * 4.0 * a2 / (1.0 - a2 * w**2) ** 2) / self.dx**2
        return -dgprim - 6.0 * self.dw * (1.0 - 2.0 * u)
