"""Allen-Cahn spectral variants: ND periodic IMEX, mass-conserving forcing,
2D circle problems, and the temperature-coupled two-component system.

Counterparts of the reference's FFT-based Allen-Cahn family:
  - ``allencahn_imex`` / ``allencahn_imex_timeforcing``
    (implementations/problem_classes/AllenCahn_MPIFFT.py:8,172)
  - ``allencahn2d_imex`` / ``allencahn2d_imex_stab``
    (implementations/problem_classes/AllenCahn_2D_FFT.py:9,200)
  - ``allencahn_temp_imex``
    (implementations/problem_classes/AllenCahn_Temp_MPIFFT.py:11)

TPU-native design notes: the reference distributes the FFT over MPI pencils
(mpi4py-fft) and optionally keeps the *state* in Fourier space
(``spectral=True``).  Here the state lives in real space on a (possibly
sharded) jnp array and the Laplacian/shifted solves go through one exact
``SpectralOperator`` — under a space-sharded mesh XLA lowers ``jnp.fft`` to
collective transposes over ICI, which is the pencil decomposition done by the
compiler instead of hand-written Alltoalls.  The mass-conserving forcing's
global sums (reference allreduce at AllenCahn_MPIFFT.py:230-259) are plain
``jnp.sum`` — collective under sharding, fused by XLA into the same program.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ProblemError
from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.linop import SpectralOperator


def _circle_blobs(grids, L, eps, ndim, rng_seed=1):
    """Sum of tanh blobs with random radii on an L x L tiling, scaled to [0,1]
    (reference AllenCahn_MPIFFT.py:140-166 ``circle_rand``)."""
    Li = int(L)
    rng = np.random.RandomState(rng_seed)
    lbound = 3.0 * eps
    ubound = 0.5 - eps
    rand_radii = (ubound - lbound) * rng.random_sample(size=(Li,) * ndim) + lbound
    tmp = jnp.zeros(grids[0].shape, grids[0].dtype)
    if ndim != 2:
        raise NotImplementedError('circle_rand initial condition is 2D only')
    for i in range(Li):
        for j in range(Li):
            r2 = (grids[0] + i - Li + 0.5) ** 2 + (grids[1] + j - Li + 0.5) ** 2
            tmp = tmp + jnp.tanh((rand_radii[i, j] - jnp.sqrt(r2)) / (np.sqrt(2) * eps)) + 1.0
    return tmp * 0.5


class AllenCahnSpectralND(Problem):
    """IMEX Allen-Cahn on the periodic box [0, L]^N with driving force:

        u_t = Lap(u) - 2/eps^2 u (1-u)(1-2u) - 6 dw u (1-u)

    diffusion implicit (exact spectral shifted solve), reaction explicit.
    Reference: ``allencahn_imex`` (AllenCahn_MPIFFT.py:8-170).
    """

    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), eps=0.04, radius=0.25, dw=0.0, L=1.0,
                 init_type='circle', dtype=None):
        nvars = (nvars,) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=nvars, dtype=dtype)
        self._register(nvars=nvars, eps=eps, radius=radius, dw=dw, L=L, init_type=init_type)
        self.lap = SpectralOperator(nvars, lengths=(L,) * len(nvars))
        self.dx = L / nvars[0]
        self.work_counters['rhs'] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    @property
    def grids(self):
        """Coordinates x_i = i * L / N on [0, L) per axis (reference local mesh,
        AllenCahn_Temp_MPIFFT.py:126-131)."""
        axes = [jnp.arange(n, dtype=self.dtype) * (self.L / n) for n in self.nvars]
        return jnp.meshgrid(*axes, indexing='ij')

    def _reaction(self, u, t):
        r = jnp.zeros_like(u)
        if self.eps > 0:
            r = -2.0 / self.eps**2 * u * (1.0 - u) * (1.0 - 2.0 * u)
            r = r - 6.0 * self.dw * u * (1.0 - u)
        return r

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return IMEX(impl=self.lap.apply(u), expl=self._reaction(u, t))

    def solve_system(self, rhs, factor, u0, t):
        return self.lap.solve_shifted(rhs, factor)

    def u_exact(self, t, u_init=None, t_init=None):
        if t != 0:
            raise ProblemError('u_exact only valid for t=0')
        gs = self.grids
        if self.init_type == 'circle':
            r2 = sum((g - 0.5) ** 2 for g in gs)
            return (0.5 * (1.0 + jnp.tanh((self.radius - jnp.sqrt(r2)) / (np.sqrt(2) * self.eps)))).astype(self.dtype)
        if self.init_type == 'circle_rand':
            return _circle_blobs(gs, self.L, self.eps, self.ndim).astype(self.dtype)
        raise NotImplementedError(f'init_type {self.init_type!r} not implemented')


class AllenCahnSpectralTimeForcing(AllenCahnSpectralND):
    """Allen-Cahn with mass-conserving time-dependent driving force: dw(t) is
    chosen each RHS evaluation so the total mass production cancels,
    dw = sum(Lap u + reaction) / sum(6 u (1-u)).
    Reference: ``allencahn_imex_timeforcing`` (AllenCahn_MPIFFT.py:172-274).

    The two global sums are single fused reductions (collective psum under a
    sharded mesh) instead of the reference's two MPI allreduces.
    """

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        impl = self.lap.apply(u)
        if self.eps > 0:
            expl = -2.0 / self.eps**2 * u * (1.0 - u) * (1.0 - 2.0 * u)
        else:
            expl = jnp.zeros_like(u)
        Rt = jnp.sum(impl + expl)
        Ht = jnp.sum(6.0 * u * (1.0 - u))
        dw = jnp.where(Ht != 0.0, Rt / jnp.where(Ht != 0.0, Ht, 1.0), 0.0)
        expl = expl - 6.0 * dw * u * (1.0 - u)
        return IMEX(impl=impl, expl=expl)


class AllenCahn2DSpectral(Problem):
    """2D IMEX Allen-Cahn with polynomial reaction on [-L/2, L/2]^2:

        u_t = Lap(u) + 1/eps^2 u (1 - u^nu)

    Reference: ``allencahn2d_imex`` (AllenCahn_2D_FFT.py:9-198).  Initial
    conditions: centered tanh circle, checkerboard, or seeded uniform noise.
    """

    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), nu=2, eps=0.04, radius=0.25, L=1.0,
                 init_type='circle', dtype=None):
        nvars = tuple(nvars)
        if len(nvars) != 2 or nvars[0] != nvars[1]:
            raise ProblemError(f'need a square 2D domain, got {nvars}')
        if nvars[0] % 2 != 0:
            raise ProblemError('the setup requires nvars = 2^p per dimension')
        super().__init__(shape=nvars, dtype=dtype)
        self._register(nvars=nvars, nu=nu, eps=eps, radius=radius, L=L, init_type=init_type)
        self.lap = SpectralOperator(nvars, lengths=(L, L))
        self.dx = L / nvars[0]
        self.xvalues = np.array([i * self.dx - L / 2.0 for i in range(nvars[0])])
        self.work_counters['rhs'] = WorkCounter()

    def _reaction(self, u):
        if self.eps > 0:
            return 1.0 / self.eps**2 * u * (1.0 - u**self.nu)
        return jnp.zeros_like(u)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return IMEX(impl=self.lap.apply(u), expl=self._reaction(u))

    def solve_system(self, rhs, factor, u0, t):
        return self.lap.solve_shifted(rhs, factor)

    def u_exact(self, t, u_init=None, t_init=None):
        if t != 0:
            raise ProblemError('u_exact only valid for t=0')
        x = jnp.asarray(self.xvalues, self.dtype)
        X, Y = jnp.meshgrid(x, x, indexing='ij')
        if self.init_type == 'circle':
            r = jnp.sqrt(X**2 + Y**2)
            return jnp.tanh((self.radius - r) / (np.sqrt(2) * self.eps)).astype(self.dtype)
        if self.init_type == 'checkerboard':
            return (jnp.sin(2.0 * np.pi * X) * jnp.sin(2.0 * np.pi * Y)).astype(self.dtype)
        if self.init_type == 'random':
            rng = np.random.RandomState(1)
            return jnp.asarray(rng.uniform(-1, 1, self.nvars), self.dtype)
        raise NotImplementedError(f'init_type {self.init_type!r} not implemented')


class AllenCahn2DSpectralStab(AllenCahn2DSpectral):
    """Stabilized splitting: the linear shift 2/eps^2 moves into the implicit
    operator, u_t = (Lap - 2/eps^2) u + [1/eps^2 u (1-u^nu) + 2/eps^2 u].
    Reference: ``allencahn2d_imex_stab`` (AllenCahn_2D_FFT.py:200-310).
    """

    def __init__(self, nvars=(256, 256), nu=2, eps=0.04, radius=0.25, L=1.0,
                 init_type='circle', dtype=None):
        super().__init__(nvars, nu, eps, radius, L, init_type, dtype)
        self.lap.symbol = self.lap.symbol - 2.0 / self.eps**2

    def _reaction(self, u):
        return super()._reaction(u) + 2.0 / self.eps**2 * u


class AllenCahnTempSpectralND(Problem):
    """Temperature-coupled Allen-Cahn, two components stacked on a leading
    axis (phase u, temperature T):

        u_t = Lap(u) - 2/eps^2 u(1-u)(1-2u) - 6 dw (T-TM)/TM u(1-u)
        T_t = D Lap(T) + u_t

    Reference: ``allencahn_temp_imex`` (AllenCahn_Temp_MPIFFT.py:11-399).
    The temperature RHS's explicit part carries the full phase RHS
    (latent-heat release), exactly as the reference composes
    ``f.expl[..., 1] = f.impl[..., 0] + f.expl[..., 0]``.
    """

    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), eps=0.04, radius=0.25, TM=1.0, D=10.0,
                 dw=0.0, L=1.0, init_type='circle', dtype=None):
        nvars = tuple(nvars)
        super().__init__(shape=(2,) + nvars, dtype=dtype)
        self._register(nvars=nvars, eps=eps, radius=radius, TM=TM, D=D, dw=dw,
                       L=L, init_type=init_type)
        self.lap = SpectralOperator(nvars, lengths=(L,) * len(nvars))
        self.dx = L / nvars[0]
        self.work_counters['rhs'] = WorkCounter()

    @property
    def ndim(self):
        return len(self.nvars)

    @property
    def grids(self):
        axes = [jnp.arange(n, dtype=self.dtype) * (self.L / n) for n in self.nvars]
        return jnp.meshgrid(*axes, indexing='ij')

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        phase, temp = u[0], u[1]
        impl_u = self.lap.apply(phase)
        impl_T = self.D * self.lap.apply(temp)
        if self.eps > 0:
            expl_u = -2.0 / self.eps**2 * phase * (1.0 - phase) * (1.0 - 2.0 * phase)
            expl_u = expl_u - 6.0 * self.dw * (temp - self.TM) / self.TM * phase * (1.0 - phase)
        else:
            expl_u = jnp.zeros_like(phase)
        expl_T = impl_u + expl_u
        return IMEX(impl=jnp.stack([impl_u, impl_T]),
                    expl=jnp.stack([expl_u, expl_T]))

    def solve_system(self, rhs, factor, u0, t):
        su = self.lap.solve_shifted(rhs[0], factor)
        sT = self.lap.solve_shifted(rhs[1], factor * self.D)
        return jnp.stack([su, sT])

    def u_exact(self, t, u_init=None, t_init=None):
        if t != 0:
            raise ProblemError('u_exact only valid for t=0')
        gs = self.grids
        if self.init_type == 'circle':
            r2 = sum((g - 0.5) ** 2 for g in gs)
            phase = 0.5 * (1.0 + jnp.tanh((self.radius - jnp.sqrt(r2)) / (np.sqrt(2) * self.eps)))
        elif self.init_type == 'circle_rand':
            phase = _circle_blobs(gs, self.L, self.eps, self.ndim)
        else:
            raise NotImplementedError(f'init_type {self.init_type!r} not implemented')
        temp = jnp.zeros_like(phase)
        return jnp.stack([phase, temp]).astype(self.dtype)
