"""Gray-Scott reaction-diffusion system, ND periodic, spectral Laplacian.

Counterpart of the reference ``grayscott_imex_diffusion`` /
``grayscott_imex_linear`` (``implementations/problem_classes/
GrayScott_MPIFFT.py``):

    u_t = Du Lap(u) - u v^2 + A (1 - u)
    v_t = Dv Lap(v) + u v^2 - B v

on [-L/2, L/2]^N.  Components are stacked on a leading axis (2, *grid); the
per-component diffusion solve reuses one spectral operator with scaled
shifts.  This is BASELINE config #4 (MLSDC with coarse-level operators).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import Comp2, IMEX
from pysdc_tpu.ops.linop import SpectralOperator


class GrayScott(Problem):
    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), Du=1e-4, Dv=1e-5, A=0.04, B=0.1,
                 L=2.0, num_blobs=1, dtype=None):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=(2,) + nvars, dtype=dtype)
        self._register(nvars=nvars, Du=Du, Dv=Dv, A=A, B=B, L=L, num_blobs=num_blobs)
        self.lap = SpectralOperator(nvars, lengths=(L,) * len(nvars))
        dx = L / nvars[0]
        self.xvalues = np.array([-L / 2 + i * dx for i in range(nvars[0])])
        self.work_counters['rhs'] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    @property
    def grids(self):
        x = jnp.asarray(self.xvalues, self.dtype)
        return jnp.meshgrid(*([x] * self.ndim), indexing='ij')

    def _reaction(self, u):
        uv2 = u[0] * u[1] ** 2
        ru = -uv2 + self.A * (1.0 - u[0])
        rv = uv2 - self.B * u[1]
        return jnp.stack([ru, rv])

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.stack([self.Du * self.lap.apply(u[0]), self.Dv * self.lap.apply(u[1])])
        return IMEX(impl=impl, expl=self._reaction(u))

    def solve_system(self, rhs, factor, u0, t):
        """(I - factor*D_c Lap) per component: same operator, scaled shift."""
        su = self.lap.solve_shifted(rhs[0], factor * self.Du)
        sv = self.lap.solve_shifted(rhs[1], factor * self.Dv)
        return jnp.stack([su, sv])

    def u_exact(self, t, u_init=None, t_init=None):
        """Initial condition: u=1, v=0 with Gaussian blobs of v
        (reference GrayScott_MPIFFT initial data); no closed form for t>0."""
        if t > 0:
            raise NotImplementedError('GrayScott has no exact solution for t > 0')
        gs = self.grids
        u = jnp.ones(self.nvars, self.dtype)
        v = jnp.zeros(self.nvars, self.dtype)
        rng = np.random.default_rng(10700)
        centers = rng.uniform(-self.L * 0.3, self.L * 0.3, size=(max(self.num_blobs, 1), self.ndim))
        if self.num_blobs == 1:
            centers = np.zeros((1, self.ndim))
        width = 0.04 * self.L
        for c in centers:
            r2 = sum((g - cc) ** 2 for g, cc in zip(gs, c))
            bump = jnp.exp(-r2 / (2 * width**2))
            v = v + 0.5 * bump
            u = u - 0.5 * bump
        return jnp.stack([u, v])


class GrayScottLinearIMEX(GrayScott):
    """Alternative splitting: diffusion + linear decay/feed implicit
    (reference grayscott_imex_linear)."""

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.stack(
            [self.Du * self.lap.apply(u[0]) - self.A * u[0], self.Dv * self.lap.apply(u[1]) - self.B * u[1]]
        )
        uv2 = u[0] * u[1] ** 2
        expl = jnp.stack([-uv2 + self.A, uv2])
        return IMEX(impl=impl, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        # (1 + factor*A - factor*Du*Lap) u = rhs, handled by shifting the rhs
        # scale: (I - factor*(Du Lap - A)) = (1 + factor*A)(I - factor/(1+factor*A) Du Lap)
        au = 1.0 + factor * self.A
        av = 1.0 + factor * self.B
        su = self.lap.solve_shifted(rhs[0] / au, factor * self.Du / au)
        sv = self.lap.solve_shifted(rhs[1] / av, factor * self.Dv / av)
        return jnp.stack([su, sv])


def _newton_2x2_pointwise(rhs, factor, u0, residual_fn, jacobian_fn, tol, maxiter):
    """Device-resident Newton for a pointwise-coupled 2-component system.

    The reference interleaves the two fields into one sparse block-diagonal
    matrix and calls spsolve per Newton step (GrayScott_MPIFFT.py:574-674);
    on TPU the Jacobian is a field of 2x2 blocks inverted in closed form —
    pure VPU arithmetic, no assembly, the whole loop one fused program.
    """
    import jax

    def body(carry):
        u, _, n = carry
        gu, gv = residual_fn(u)
        j00, j01, j10, j11 = jacobian_fn(u)
        det = j00 * j11 - j01 * j10
        du = (j11 * gu - j01 * gv) / det
        dv = (j00 * gv - j10 * gu) / det
        u = jnp.stack([u[0] - du, u[1] - dv])
        gu, gv = residual_fn(u)
        res = jnp.maximum(jnp.max(jnp.abs(gu)), jnp.max(jnp.abs(gv)))
        return u, res, n + 1

    def cond(carry):
        _, res, n = carry
        return jnp.logical_and(res > tol, n < maxiter)

    gu0, gv0 = residual_fn(u0)
    res0 = jnp.maximum(jnp.max(jnp.abs(gu0)), jnp.max(jnp.abs(gv0)))
    u, _, _ = jax.lax.while_loop(cond, body, (u0, res0, jnp.asarray(0)))
    return u


class GrayScottMultiImplicit(GrayScott):
    """Multi-implicit splitting: diffusion (comp1, exact spectral solves)
    and reaction (comp2, pointwise 2x2 Newton) both implicit but solved
    separately (reference ``grayscott_mi_diffusion``,
    GrayScott_MPIFFT.py:429-672); drives the multi-implicit sweeper's
    Q1/Q2 split."""

    f_kind = 'comp2'

    def __init__(self, nvars=(128, 128), Du=1e-4, Dv=1e-5, A=0.04, B=0.1,
                 L=2.0, num_blobs=1, newton_maxiter=100, newton_tol=1e-12, dtype=None):
        super().__init__(nvars=nvars, Du=Du, Dv=Dv, A=A, B=B, L=L,
                         num_blobs=num_blobs, dtype=dtype)
        self._register(newton_maxiter=newton_maxiter, newton_tol=newton_tol)
        self.work_counters['newton'] = WorkCounter()

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.stack([self.Du * self.lap.apply(u[0]), self.Dv * self.lap.apply(u[1])])
        return Comp2(comp1=impl, comp2=self._reaction(u))

    def solve_system(self, rhs, factor, u0, t):
        """comp1: per-component diffusion solve (scaled spectral shifts)."""
        su = self.lap.solve_shifted(rhs[0], factor * self.Du)
        sv = self.lap.solve_shifted(rhs[1], factor * self.Dv)
        return jnp.stack([su, sv])

    def solve_system_2(self, rhs, factor, u0, t):
        """comp2: u - factor * R(u) = rhs with the full reaction R."""
        self.work_counters['newton']()
        A, B = self.A, self.B

        def residual(u):
            uv2 = u[0] * u[1] ** 2
            gu = u[0] - rhs[0] - factor * (-uv2 + A * (1.0 - u[0]))
            gv = u[1] - rhs[1] - factor * (uv2 - B * u[1])
            return gu, gv

        def jacobian(u):
            j00 = 1.0 - factor * (-(u[1] ** 2) - A)
            j01 = -factor * (-2.0 * u[0] * u[1])
            j10 = -factor * (u[1] ** 2)
            j11 = 1.0 - factor * (2.0 * u[0] * u[1] - B)
            return j00, j01, j10, j11

        return _newton_2x2_pointwise(rhs, factor, u0, residual, jacobian,
                                     self.newton_tol, self.newton_maxiter)


class GrayScottMultiImplicitLinear(GrayScottMultiImplicit):
    """Multi-implicit with the linear decay/feed terms folded into the
    diffusion component (reference ``grayscott_mi_linear``,
    GrayScott_MPIFFT.py:674-803): comp1 = D Lap - decay, comp2 = pure
    nonlinear reaction."""

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = jnp.stack(
            [self.Du * self.lap.apply(u[0]) - self.A * u[0],
             self.Dv * self.lap.apply(u[1]) - self.B * u[1]]
        )
        uv2 = u[0] * u[1] ** 2
        return Comp2(comp1=impl, comp2=jnp.stack([-uv2 + self.A, uv2]))

    def solve_system(self, rhs, factor, u0, t):
        au = 1.0 + factor * self.A
        av = 1.0 + factor * self.B
        su = self.lap.solve_shifted(rhs[0] / au, factor * self.Du / au)
        sv = self.lap.solve_shifted(rhs[1] / av, factor * self.Dv / av)
        return jnp.stack([su, sv])

    def solve_system_2(self, rhs, factor, u0, t):
        self.work_counters['newton']()
        A = self.A

        def residual(u):
            uv2 = u[0] * u[1] ** 2
            return u[0] - rhs[0] - factor * (-uv2 + A), u[1] - rhs[1] - factor * uv2

        def jacobian(u):
            j00 = 1.0 + factor * u[1] ** 2
            j01 = factor * 2.0 * u[0] * u[1]
            j10 = -factor * (u[1] ** 2)
            j11 = 1.0 - factor * 2.0 * u[0] * u[1]
            return j00, j01, j10, j11

        return _newton_2x2_pointwise(rhs, factor, u0, residual, jacobian,
                                     self.newton_tol, self.newton_maxiter)
