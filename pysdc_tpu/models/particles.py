"""Particle/second-order problems: state is a (pos, vel) pytree.

Counterparts of the reference's particle problems
(``implementations/problem_classes/``: HarmonicOscillator.py,
FermiPastaUlamTsingou.py, OuterSolarSystem.py) and the ``particles``
datatype (datatype_classes/particles.py).  The RHS of a second-order
problem is the *acceleration* (shape of vel); the Verlet sweeper consumes
it through the Particles pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter


class Particles(NamedTuple):
    """Second-order state: position + velocity (leaves of equal shape)."""

    pos: jnp.ndarray
    vel: jnp.ndarray


class HarmonicOscillator(Problem):
    """x'' = -k x - mu x' (reference HarmonicOscillator.py)."""

    def __init__(self, k=1.0, mu=0.0, u0=(1.0, 0.0), phase=0.0, amp=1.0, dtype=None):
        super().__init__(shape=(1,), dtype=dtype)
        self._register(k=k, mu=mu, u0=u0, phase=phase, amp=amp)
        self.work_counters['rhs'] = WorkCounter()

    @property
    def u_init(self):
        return Particles(
            pos=jnp.full((1,), self.u0[0], self.dtype), vel=jnp.full((1,), self.u0[1], self.dtype)
        )

    def eval_f(self, u: Particles, t):
        self.work_counters['rhs']()
        return -self.k * u.pos - self.mu * u.vel

    def u_exact(self, t, u_init=None, t_init=0.0):
        """Closed-form damped oscillator (reference HarmonicOscillator.py:80+)."""
        k, mu = self.k, self.mu
        delta = mu / 2.0
        omega = np.sqrt(k)
        x0, v0 = self.u0
        if delta == 0:
            pos = x0 * jnp.cos(omega * t) + v0 / omega * jnp.sin(omega * t)
            vel = -x0 * omega * jnp.sin(omega * t) + v0 * jnp.cos(omega * t)
        elif delta < omega:  # underdamped
            om = np.sqrt(omega**2 - delta**2)
            A = x0
            B = (v0 + delta * x0) / om
            e = jnp.exp(-delta * t)
            pos = e * (A * jnp.cos(om * t) + B * jnp.sin(om * t))
            vel = e * ((-delta * A + om * B) * jnp.cos(om * t) + (-delta * B - om * A) * jnp.sin(om * t))
        else:
            raise NotImplementedError('only undamped/underdamped closed forms implemented')
        return Particles(pos=jnp.full((1,), pos, self.dtype), vel=jnp.full((1,), vel, self.dtype))

    def eval_hamiltonian(self, u: Particles):
        return 0.5 * jnp.sum(u.vel**2) + 0.5 * self.k * jnp.sum(u.pos**2)


class FermiPastaUlamTsingou(Problem):
    """FPUT chain with quartic coupling (reference FermiPastaUlamTsingou.py):
    x_i'' = (x_{i+1} - 2 x_i + x_{i-1}) + alpha*((x_{i+1}-x_i)^2 - (x_i-x_{i-1})^2)."""

    def __init__(self, npart=2048, alpha=0.25, k=1.0, energy_modes=(1,), dtype=None):
        super().__init__(shape=(npart,), dtype=dtype)
        self._register(npart=npart, alpha=alpha, k=k, energy_modes=tuple(energy_modes))
        self.work_counters['rhs'] = WorkCounter()

    @property
    def u_init(self):
        return self.u_exact(0.0)

    def eval_f(self, u: Particles, t):
        self.work_counters['rhs']()
        x = u.pos
        # fixed (zero) boundaries
        xp = jnp.concatenate([x[1:], jnp.zeros(1, x.dtype)])
        xm = jnp.concatenate([jnp.zeros(1, x.dtype), x[:-1]])
        dr = xp - x
        dl = x - xm
        return (dr - dl) + self.alpha * (dr**2 - dl**2)

    def u_exact(self, t, u_init=None, t_init=0.0):
        if float(t) != 0.0:
            raise NotImplementedError('u_exact only implemented for t=0')
        n = self.npart
        i = jnp.arange(1, n + 1)
        pos = jnp.sin(jnp.pi * i / (n + 1)) * 0.0
        vel = jnp.sqrt(2.0 / (n + 1)) * jnp.sin(jnp.pi * i / (n + 1))
        return Particles(pos=pos.astype(self.dtype), vel=vel.astype(self.dtype))

    def eval_hamiltonian(self, u: Particles):
        x = u.pos
        xp = jnp.concatenate([x[1:], jnp.zeros(1, x.dtype)])
        dr = xp - x
        d0 = jnp.concatenate([x[:1]])  # left boundary spring
        ham = 0.5 * jnp.sum(u.vel**2)
        ham += jnp.sum(0.5 * dr**2 + self.alpha / 3.0 * dr**3)
        ham += 0.5 * d0[0] ** 2 + self.alpha / 3.0 * d0[0] ** 3
        return ham


class OuterSolarSystem(Problem):
    """Six-body outer solar system (reference OuterSolarSystem.py): sun,
    Jupiter, Saturn, Uranus, Neptune, Pluto; standard astronomical data."""

    G = 2.95912208286e-4

    def __init__(self, sun_only=False, dtype=None):
        super().__init__(shape=(3, 6), dtype=dtype)
        self._register(sun_only=sun_only)
        self.masses = jnp.asarray(
            [1.00000597682, 0.000954786104043, 0.000285583733151, 4.37273164546e-5, 5.17759138449e-5, 1.0 / 130000000.0]
        )
        self.work_counters['rhs'] = WorkCounter()

    def eval_f(self, u: Particles, t):
        """Pairwise gravitational accelerations, fully vectorized."""
        self.work_counters['rhs']()
        pos = u.pos  # (3, N)
        diff = pos[:, None, :] - pos[:, :, None]  # (3, i, j): x_j - x_i
        r2 = jnp.sum(diff**2, axis=0) + jnp.eye(pos.shape[1])
        inv_r3 = jnp.where(jnp.eye(pos.shape[1], dtype=bool), 0.0, r2 ** (-1.5))
        if self.sun_only:
            # acceleration of body i due to the sun only
            diff_sun = pos[:, :1] - pos  # (3, N)
            r2s = jnp.sum(diff_sun**2, axis=0)
            r2s = jnp.where(r2s == 0, 1.0, r2s)
            acc = self.G * self.masses[0] * diff_sun / r2s ** 1.5
            acc = acc.at[:, 0].set(0.0)
            return acc
        acc = self.G * jnp.einsum('j,dij->di', self.masses, diff * inv_r3[None])
        return acc

    def u_exact(self, t, u_init=None, t_init=0.0):
        if float(t) != 0.0:
            raise NotImplementedError('u_exact only works for the initial time t0=0')
        pos = np.array(
            [
                [0.0, 0.0, 0.0],
                [-3.5025653, -3.8169847, -1.5507963],
                [9.0755314, -3.0458353, -1.6483708],
                [8.3101420, -16.2901086, -7.2521278],
                [11.4707666, -25.7294829, -10.8169456],
                [-15.5387357, -25.2225594, -3.1902382],
            ]
        ).T
        vel = np.array(
            [
                [0.0, 0.0, 0.0],
                [0.00565429, -0.00412490, -0.00190589],
                [0.00168318, 0.00483525, 0.00192462],
                [0.00354178, 0.00137102, 0.00055029],
                [0.00288930, 0.00114527, 0.00039677],
                [0.00276725, -0.0017072, -0.00136504],
            ]
        ).T
        return Particles(pos=jnp.asarray(pos, self.dtype), vel=jnp.asarray(vel, self.dtype))

    def eval_hamiltonian(self, u: Particles):
        kin = 0.5 * jnp.sum(self.masses * jnp.sum(u.vel**2, axis=0))
        diff = u.pos[:, None, :] - u.pos[:, :, None]
        r = jnp.sqrt(jnp.sum(diff**2, axis=0) + jnp.eye(6))
        mm = self.masses[:, None] * self.masses[None, :]
        pot = -self.G * jnp.sum(jnp.triu(mm / r, k=1))
        return kin + pot


class EMFields(NamedTuple):
    """E and B fields per particle (the Boris sweeper's RHS container,
    reference datatype_classes/particles.py fields type)."""

    elec: jnp.ndarray  # (3, N)
    magn: jnp.ndarray  # (3, N)


class PenningTrap3D(Problem):
    """Charged particles in a Penning trap (reference PenningTrap_3D.py):
    external quadrupole E field + axial B field + smoothed pairwise Coulomb
    interactions.  Used with the Boris SDC sweeper."""

    def __init__(self, omega_B=25.0, omega_E=4.9, u0=None, nparts=1, sig=0.1, dtype=None):
        super().__init__(shape=(3, nparts), dtype=dtype)
        u0 = u0 if u0 is not None else (np.array([10.0, 0.0, 0.0]), np.array([100.0, 0.0, 100.0]), 1.0, 1.0)
        self._register(omega_B=omega_B, omega_E=omega_E, u0=u0, nparts=nparts, sig=sig)
        self.q = jnp.full((nparts,), float(u0[2]))
        self.m = jnp.full((nparts,), float(u0[3]))
        self.work_counters['rhs'] = WorkCounter()
        self.work_counters['Boris_solver'] = WorkCounter()

    def _interactions(self, pos):
        """Smoothed pairwise Coulomb field (reference fast_interactions)."""
        diff = pos[:, :, None] - pos[:, None, :]  # (3, i, j) = x_i - x_j
        dist2 = jnp.sum(diff**2, axis=0) + self.sig**2
        w = self.q[None, :] / dist2**1.5
        w = w * (1.0 - jnp.eye(self.nparts))
        return jnp.einsum('dij,ij->di', diff, w)

    def eval_f(self, part: Particles, t):
        self.work_counters['rhs']()
        Emat = jnp.diag(jnp.asarray([1.0, 1.0, -2.0]))
        alpha = self.q / self.m
        elec = self._interactions(part.pos) + self.omega_E**2 / alpha * (Emat @ part.pos)
        magn = jnp.zeros_like(part.pos).at[2].set(self.omega_B)
        return EMFields(elec=elec, magn=magn)

    def build_f(self, f: EMFields, part: Particles, t):
        """Acceleration from fields: q/m (E + v x B) (reference :305-333)."""
        alpha = self.q / self.m
        return alpha * (f.elec + jnp.cross(part.vel, f.magn, axis=0))

    def boris_solver(self, c, dt, old_fields: EMFields, new_fields: EMFields, old_parts: Particles):
        """Boris rotation velocity update with the SDC c-term
        (reference :336-377), vectorized over particles."""
        self.work_counters['Boris_solver']()
        alpha = self.q / self.m
        Emean = 0.5 * (old_fields.elec + new_fields.elec)
        c = c + dt / 2 * alpha * jnp.cross(old_parts.vel, old_fields.magn - new_fields.magn, axis=0)
        vm = old_parts.vel + dt / 2 * alpha * Emean + c / 2
        t_vec = dt / 2 * alpha * new_fields.magn
        s = 2 * t_vec / (1.0 + jnp.sum(t_vec**2, axis=0))
        vp = vm + jnp.cross(vm + jnp.cross(vm, t_vec, axis=0), s, axis=0)
        return vp + dt / 2 * alpha * Emean + c / 2

    def u_exact(self, t, u_init=None, t_init=0.0):
        """Analytic single-particle trajectory (reference :252-303)."""
        if self.nparts != 1:
            raise NotImplementedError('u_exact is only valid for a single particle')
        wE, wB = self.omega_E, self.omega_B
        p0, v0 = np.asarray(self.u0[0]), np.asarray(self.u0[1])
        wbar = np.sqrt(2) * wE
        pos_z = p0[2] * jnp.cos(wbar * t) + v0[2] / wbar * jnp.sin(wbar * t)
        vel_z = -p0[2] * wbar * jnp.sin(wbar * t) + v0[2] * jnp.cos(wbar * t)
        Op = 0.5 * (wB + np.sqrt(wB**2 - 4 * wE**2))
        Om = 0.5 * (wB - np.sqrt(wB**2 - 4 * wE**2))
        Rm = (Op * p0[0] + v0[1]) / (Op - Om)
        Rp = p0[0] - Rm
        Im = (Op * p0[1] - v0[0]) / (Op - Om)
        Ip = p0[1] - Im
        w = (Rp + Ip * 1j) * jnp.exp(-Op * t * 1j) + (Rm + Im * 1j) * jnp.exp(-Om * t * 1j)
        dw = -1j * Op * (Rp + Ip * 1j) * jnp.exp(-Op * t * 1j) - 1j * Om * (Rm + Im * 1j) * jnp.exp(-Om * t * 1j)
        pos = jnp.stack([jnp.real(w), jnp.imag(w), pos_z])[:, None]
        vel = jnp.stack([jnp.real(dw), jnp.imag(dw), vel_z])[:, None]
        return Particles(pos=pos.astype(self.dtype), vel=vel.astype(self.dtype))


class HenonHeiles(Problem):
    """Henon-Heiles chaotic Hamiltonian system (reference HenonHeiles.py):
    x'' = -x - 2 x y, y'' = -y - (x^2 - y^2)."""

    def __init__(self, dtype=None):
        super().__init__(shape=(2,), dtype=dtype)
        self.work_counters['rhs'] = WorkCounter()

    @property
    def u_init(self):
        return self.u_exact(0.0)

    def eval_f(self, u: Particles, t):
        self.work_counters['rhs']()
        x, y = u.pos[0], u.pos[1]
        return jnp.stack([-x - 2 * x * y, -y - (x**2 - y**2)])

    def u_exact(self, t, u_init=None, t_init=0.0):
        if float(t) != 0.0:
            raise NotImplementedError('initial condition only')
        q1 = 0.1
        p0 = np.sqrt(2 * (1 / 12.0 - 0.5 * q1**2 + q1**3 / 3.0))  # H = 1/12 shell
        return Particles(pos=jnp.asarray([0.0, q1], self.dtype), vel=jnp.asarray([p0, 0.0], self.dtype))

    def eval_hamiltonian(self, u: Particles):
        x, y = u.pos[0], u.pos[1]
        return 0.5 * jnp.sum(u.vel**2) + 0.5 * (x**2 + y**2) + x**2 * y - y**3 / 3.0


class FullSolarSystem(OuterSolarSystem):
    """Ten-body solar system (reference FullSolarSystem.py): the outer solar
    system plus the four inner planets; initial data from the reference."""

    def __init__(self, sun_only=False, dtype=None):
        Problem.__init__(self, shape=(3, 10), dtype=dtype)
        self._register(sun_only=sun_only)
        # masses relative to the sun (standard astronomical values)
        self.masses = jnp.asarray(
            [
                1.00000597682,      # Sun (+ inner dust)
                1.0 / 6023600.0,    # Mercury
                1.0 / 408523.5,     # Venus
                1.0 / 328900.5,     # Earth+Moon
                1.0 / 3098710.0,    # Mars
                0.000954786104043,  # Jupiter
                0.000285583733151,  # Saturn
                4.37273164546e-5,   # Uranus
                5.17759138449e-5,   # Neptune
                1.0 / 130000000.0,  # Pluto
            ]
        )
        self.work_counters['rhs'] = WorkCounter()

    def u_exact(self, t, u_init=None, t_init=0.0):
        if float(t) != 0.0:
            raise NotImplementedError('u_exact only works for t=0')
        # heliocentric positions [AU] and velocities [AU/day] (J2000-like data)
        pos = np.array(
            [
                [0.0, 0.0, 0.0],
                [-0.1302, -0.4473, -0.0246],
                [-0.7183, -0.0327, 0.0410],
                [-0.1842, 0.9645, 0.0000],
                [1.3835, -0.0162, -0.0342],
                [-3.5025653, -3.8169847, -1.5507963],
                [9.0755314, -3.0458353, -1.6483708],
                [8.3101420, -16.2901086, -7.2521278],
                [11.4707666, -25.7294829, -10.8169456],
                [-15.5387357, -25.2225594, -3.1902382],
            ]
        ).T
        vel = np.array(
            [
                [0.0, 0.0, 0.0],
                [0.02145, -0.00614, -0.00246],
                [0.00080, -0.02031, -0.00033],
                [-0.01720, -0.00329, 0.0000],
                [0.00067, 0.01513, 0.00031],
                [0.00565429, -0.00412490, -0.00190589],
                [0.00168318, 0.00483525, 0.00192462],
                [0.00354178, 0.00137102, 0.00055029],
                [0.00288930, 0.00114527, 0.00039677],
                [0.00276725, -0.0017072, -0.00136504],
            ]
        ).T
        return Particles(pos=jnp.asarray(pos, self.dtype), vel=jnp.asarray(vel, self.dtype))

    def eval_hamiltonian(self, u: Particles):
        kin = 0.5 * jnp.sum(self.masses * jnp.sum(u.vel**2, axis=0))
        N = u.pos.shape[1]
        diff = u.pos[:, None, :] - u.pos[:, :, None]
        r = jnp.sqrt(jnp.sum(diff**2, axis=0) + jnp.eye(N))
        mm = self.masses[:, None] * self.masses[None, :]
        pot = -self.G * jnp.sum(jnp.triu(mm / r, k=1))
        return kin + pot
