"""Incompressible Navier-Stokes, 2D periodic, vorticity-streamfunction form.

Fills the reference's incompressible-NSE capability beyond Rayleigh-Benard
(``projects/StroemungsRaum`` — pseudo-spectral incompressible NSE):

    w_t + u . grad(w) = nu Lap(w),   u = (psi_y, -psi_x),  Lap(psi) = -w

on [0, L)^2.  IMEX split: diffusion implicit (exact spectral division, dt a
traced scalar), advection explicit with 2/3-rule dealiasing.  The velocity
recovery, dealiasing, advection and diffusion are all Fourier-space
elementwise/FFT work — one XLA program per substep, HBM-streaming on TPU.

Taylor-Green vortices are an exact nonlinear solution (their advection term
vanishes identically), giving spectral-accuracy gates for the full IMEX
path; an optional random multi-mode initial condition drives real 2D
turbulence for decay studies.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter
from pysdc_tpu.core.state import IMEX


class NavierStokesVorticity2D(Problem):
    """State: vorticity w of shape (nx, ny) (single component)."""

    f_kind = 'imex'

    def __init__(self, nvars=(128, 128), nu=1e-3, L=2 * np.pi, k_tg=1,
                 dealias=True, dtype=None):
        nvars = (nvars, nvars) if isinstance(nvars, int) else tuple(nvars)
        super().__init__(shape=nvars, dtype=dtype)
        self._register(nvars=nvars, nu=nu, L=L, k_tg=k_tg, dealias=dealias)

        nx, ny = nvars
        kx = 2 * np.pi * np.fft.fftfreq(nx, d=1.0 / nx) / L
        ky = 2 * np.pi * np.fft.fftfreq(ny, d=1.0 / ny) / L
        KX, KY = np.meshgrid(kx, ky, indexing='ij')
        self._kx, self._ky = jnp.asarray(KX), jnp.asarray(KY)
        K2 = KX**2 + KY**2
        self._k2 = jnp.asarray(K2)
        # Poisson inverse: psi_hat = w_hat / k^2 (zero-mean gauge at k = 0)
        K2_safe = K2.copy()
        K2_safe[0, 0] = 1.0
        self._inv_k2 = jnp.asarray(1.0 / K2_safe)
        # 2/3-rule dealias mask for the quadratic advection term
        mask = (np.abs(KX) <= (2.0 / 3.0) * np.max(np.abs(kx))) & (
            np.abs(KY) <= (2.0 / 3.0) * np.max(np.abs(ky))
        )
        self._dealias_mask = jnp.asarray(mask if dealias else np.ones_like(mask))
        self.work_counters['rhs'] = WorkCounter()

    # -- grids / fields ---------------------------------------------------
    @property
    def grids(self):
        nx, ny = self.nvars
        x = jnp.asarray(np.arange(nx) * self.L / nx, self.dtype)
        y = jnp.asarray(np.arange(ny) * self.L / ny, self.dtype)
        return jnp.meshgrid(x, y, indexing='ij')

    def velocity(self, w):
        """u = (psi_y, -psi_x) from vorticity (divergence-free by
        construction)."""
        w_hat = jnp.fft.fft2(w)
        psi_hat = w_hat * self._inv_k2
        u = jnp.real(jnp.fft.ifft2(1j * self._ky * psi_hat))
        v = jnp.real(jnp.fft.ifft2(-1j * self._kx * psi_hat))
        return u.astype(w.dtype), v.astype(w.dtype)

    # -- protocol ----------------------------------------------------------
    def eval_f(self, w, t):
        self.work_counters['rhs']()
        w_hat = jnp.fft.fft2(w)
        psi_hat = w_hat * self._inv_k2
        u = jnp.real(jnp.fft.ifft2(1j * self._ky * psi_hat))
        v = jnp.real(jnp.fft.ifft2(-1j * self._kx * psi_hat))
        wx = jnp.real(jnp.fft.ifft2(1j * self._kx * w_hat))
        wy = jnp.real(jnp.fft.ifft2(1j * self._ky * w_hat))
        adv_hat = jnp.fft.fft2(u * wx + v * wy) * self._dealias_mask
        expl = -jnp.real(jnp.fft.ifft2(adv_hat)).astype(w.dtype)
        impl = self.nu * jnp.real(jnp.fft.ifft2(-self._k2 * w_hat)).astype(w.dtype)
        return IMEX(impl=impl, expl=expl)

    def solve_system(self, rhs, factor, u0, t):
        """(I + factor*nu*k^2)^-1 in Fourier space; factor stays traced."""
        rhat = jnp.fft.fft2(rhs)
        xhat = rhat / (1.0 + factor * self.nu * self._k2)
        return jnp.real(jnp.fft.ifft2(xhat)).astype(rhs.dtype)

    def u_exact(self, t, u_init=None, t_init=None, kind='taylor_green', seed=42, n_modes=6):
        """'taylor_green': exact nonlinear solution
        w = 2 k cos(kx) cos(ky) exp(-2 nu k^2 t); 'random': multi-mode
        turbulence seed (t = 0 only)."""
        X, Y = self.grids
        if kind == 'taylor_green':
            k = 2 * np.pi * self.k_tg / self.L
            decay = jnp.exp(jnp.asarray(-2.0 * self.nu * k**2 * float(t)))
            return (2 * k * jnp.cos(k * X) * jnp.cos(k * Y) * decay).astype(self.dtype)
        if float(t) != 0.0:
            raise NotImplementedError('random IC defined at t = 0 only')
        rng = np.random.default_rng(seed)
        w = jnp.zeros(self.shape, self.dtype)
        for _ in range(n_modes):
            kx = float(2 * np.pi * rng.integers(1, 4) / self.L)
            ky = float(2 * np.pi * rng.integers(1, 4) / self.L)
            amp, ph1, ph2 = rng.standard_normal(), rng.uniform(0, 2 * np.pi), rng.uniform(0, 2 * np.pi)
            w = w + float(amp) * jnp.cos(kx * X + float(ph1)) * jnp.cos(ky * Y + float(ph2))
        return w.astype(self.dtype)

    # -- diagnostics (StroemungsRaum-style observables) ---------------------
    def kinetic_energy(self, w):
        u, v = self.velocity(w)
        cell = (self.L / self.nvars[0]) * (self.L / self.nvars[1])
        return 0.5 * float(jnp.sum(u**2 + v**2)) * cell

    def enstrophy(self, w):
        cell = (self.L / self.nvars[0]) * (self.L / self.nvars[1])
        return 0.5 * float(jnp.sum(w**2)) * cell

    def energy_spectrum(self, w):
        """Isotropic kinetic-energy spectrum E(k) (integer-shell binning)."""
        w_hat = jnp.fft.fft2(w) / (self.nvars[0] * self.nvars[1])
        psi_hat = w_hat * self._inv_k2
        e_density = 0.5 * self._k2 * jnp.abs(psi_hat) ** 2
        k_mag = np.sqrt(np.asarray(self._k2))
        k_int = np.rint(k_mag / (2 * np.pi / self.L)).astype(int)
        kmax = k_int.max()
        E = np.zeros(kmax + 1)
        np.add.at(E, k_int.ravel(), np.asarray(e_density).ravel())
        return np.arange(kmax + 1), E

    def divergence(self, w):
        """Max |div u| — zero to roundoff by construction."""
        u, v = self.velocity(w)
        ux = jnp.real(jnp.fft.ifft2(1j * self._kx * jnp.fft.fft2(u)))
        vy = jnp.real(jnp.fft.ifft2(1j * self._ky * jnp.fft.fft2(v)))
        return float(jnp.max(jnp.abs(ux + vy)))
