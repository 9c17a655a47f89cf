"""Spectral (Chebyshev/ultraspherical) problems: 1D heat, Burgers.

Counterparts of the reference ``HeatEquation_Chebychev.py`` and
``Burgers.py`` on the TPU-native spectral layer (``ops/spectral.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX
from pysdc_tpu.ops.spectral import SpectralLinearProblemBase, UltrasphericalBase1D


class HeatChebyshev1D(Problem):
    """u_t = nu u_xx + f with Dirichlet BCs via the ultraspherical method
    (reference HeatEquation_Chebychev.py).  State shape: (1, 1, nz)."""

    def __init__(self, nvars=64, nu=1.0, a=0.0, b=0.0, freq=1, dtype=None):
        super().__init__(shape=(1, 1, nvars), dtype=dtype)
        self._register(nvars=nvars, nu=nu, a=a, b=b, freq=freq)
        z = UltrasphericalBase1D(nvars, -1.0, 1.0)
        self.zb = z
        self.spec = SpectralLinearProblemBase(['u'], None, z)
        U02 = z.conv_matrix(0, 2)
        self.spec.set_L({'u': {'u': [(0, -nu * z.diff_matrix(2))]}})
        self.spec.set_M({'u': {'u': [(0, U02)]}})
        self.spec.add_BC('u', 'u', z.dirichlet_row(-1.0), a, line=-2)
        self.spec.add_BC('u', 'u', z.dirichlet_row(1.0), b, line=-1)
        self.spec.setup_operators()
        # base change C^(2) -> T for evaluating L u in real space
        self._S2_inv = np.linalg.inv(U02)
        self.work_counters['rhs'] = WorkCounter()

    @property
    def grid(self):
        return jnp.asarray(self.zb.nodes)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        u_hat = self.spec.transform(u)
        Lu_hat = self.spec.apply_operator(self.spec.L_all, u_hat)
        Lu_hat = jnp.tensordot(jnp.asarray(self._S2_inv, Lu_hat.dtype), Lu_hat, axes=(1, 2)).transpose(1, 2, 0)
        return -self.spec.itransform(Lu_hat)

    def solve_system(self, rhs, factor, u0, t):
        return self.spec.solve_shifted(rhs, factor)

    def u_exact(self, t, u_init=None, t_init=None):
        """Decaying sine mode satisfying u(+-1)=0 for a=b=0."""
        x = self.grid
        lam = -self.nu * (np.pi * self.freq) ** 2
        prof = jnp.sin(np.pi * self.freq * (x + 1) / 2.0) * jnp.exp(lam / 4.0 * t)
        return prof[None, None, :].astype(self.dtype)


class Burgers1D(Problem):
    """Viscous Burgers u_t = eps u_xx - u u_x on [-1, 1], Dirichlet BCs,
    IMEX split (reference Burgers.py Burgers1D): diffusion implicit,
    advection explicit with dealiased pseudospectral products."""

    f_kind = 'imex'

    def __init__(self, nvars=64, epsilon=0.1, BCl=1.0, BCr=-1.0, dtype=None):
        super().__init__(shape=(1, 1, nvars), dtype=dtype)
        self._register(nvars=nvars, epsilon=epsilon, BCl=BCl, BCr=BCr)
        z = UltrasphericalBase1D(nvars, -1.0, 1.0)
        self.zb = z
        self.spec = SpectralLinearProblemBase(['u'], None, z)
        U02 = z.conv_matrix(0, 2)
        self.spec.set_L({'u': {'u': [(0, -epsilon * z.diff_matrix(2))]}})
        self.spec.set_M({'u': {'u': [(0, U02)]}})
        self.spec.add_BC('u', 'u', z.dirichlet_row(-1.0), BCl, line=-2)
        self.spec.add_BC('u', 'u', z.dirichlet_row(1.0), BCr, line=-1)
        self.spec.setup_operators()
        self._S2_inv = np.linalg.inv(U02)
        # first derivative in T coefficients (for the advection term)
        self._Dz_T = np.linalg.inv(z.conv_matrix(0, 1)) @ z.diff_matrix(1)
        self.work_counters['rhs'] = WorkCounter()

    @property
    def grid(self):
        return jnp.asarray(self.zb.nodes)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        u_hat = self.spec.transform(u)
        Lu_hat = self.spec.apply_operator(self.spec.L_all, u_hat)
        Lu_hat = jnp.tensordot(jnp.asarray(self._S2_inv, Lu_hat.dtype), Lu_hat, axes=(1, 2)).transpose(1, 2, 0)
        impl = -self.spec.itransform(Lu_hat)

        ux_hat = jnp.tensordot(jnp.asarray(self._Dz_T, u_hat.dtype), u_hat, axes=(1, 2)).transpose(1, 2, 0)
        ux = self.spec.itransform(ux_hat)
        expl = -u * ux
        return IMEX(impl=impl, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        return self.spec.solve_shifted(rhs, factor)

    def u_exact(self, t, u_init=None, t_init=None):
        if float(t) != 0.0:
            raise NotImplementedError('Burgers has no closed-form solution here; initial condition only')
        x = self.grid
        # initial condition matching the BCs: -x plus a sine perturbation
        u0 = self.BCl * (1 - x) / 2 + self.BCr * (1 + x) / 2 + 0.25 * jnp.sin(np.pi * x)
        return u0[None, None, :].astype(self.dtype)
