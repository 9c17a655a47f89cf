"""Spectral subsystem tests: bases, Chebyshev heat, Burgers, Rayleigh-Benard
(mirrors reference tests of spectral_helper / generic_spectral / RBC)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.rayleigh_benard import RayleighBenard
from pysdc_tpu.models.spectral_problems import Burgers1D, HeatChebyshev1D
from pysdc_tpu.ops.spectral import FourierBase1D, UltrasphericalBase1D
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper


def test_ultraspherical_transform_roundtrip():
    z = UltrasphericalBase1D(32, -1.0, 1.0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((4, 32)))
    a = z.transform(v, axis=1)
    back = z.itransform(a, axis=1)
    assert float(jnp.max(jnp.abs(back - v))) < 1e-12


def test_ultraspherical_differentiation_exact_for_polynomials():
    z = UltrasphericalBase1D(16, -1.0, 1.0)
    x = jnp.asarray(z.nodes)
    u = 3 * x**4 - 2 * x**2 + x  # derivative: 12x^3 - 4x + 1
    a = z.transform(u[None], axis=1)[0]
    D1_T = np.linalg.inv(z.conv_matrix(0, 1)) @ z.diff_matrix(1)
    du = z.itransform((jnp.asarray(D1_T) @ a)[None], axis=1)[0]
    expect = 12 * x**3 - 4 * x + 1
    assert float(jnp.max(jnp.abs(du - expect))) < 1e-10


def test_ultraspherical_integral_and_dirichlet_rows():
    z = UltrasphericalBase1D(16, 0.0, 2.0)
    x = jnp.asarray(z.nodes)
    u = x**3 - x  # integral over [0,2] = 4 - 2 = 2; u(0)=0, u(2)=6
    a = np.asarray(z.transform(u[None], axis=1)[0])
    assert z.integral_row() @ a == pytest.approx(2.0, abs=1e-12)
    assert z.dirichlet_row(0.0) @ a == pytest.approx(0.0, abs=1e-10)
    assert z.dirichlet_row(2.0) @ a == pytest.approx(6.0, abs=1e-10)


def test_heat_chebyshev_exact_decay():
    desc = dict(
        problem_class=HeatChebyshev1D,
        problem_params=dict(nvars=32, nu=1.0, freq=1),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-11),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.25)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(0.25)))) < 1e-8


def test_burgers_self_convergence_and_bcs():
    def run(dt):
        desc = dict(
            problem_class=Burgers1D,
            problem_params=dict(nvars=48, epsilon=0.1),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(num_nodes=3, QI='LU'),
            level_params=dict(dt=dt, restol=1e-11),
            step_params=dict(maxiter=30),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 0.2)
        return P, uend

    P, u1 = run(0.02)
    _, u2 = run(0.005)
    assert float(jnp.max(jnp.abs(u1 - u2))) < 1e-7
    # front steepens under advection
    assert float(jnp.max(jnp.abs(jnp.diff(u1[0, 0])))) > float(
        jnp.max(jnp.abs(jnp.diff(P.u_exact(0.0)[0, 0])))
    )


class TestRayleighBenard:
    def _problem(self, Ra=2e4):
        return RayleighBenard(nx=32, nz=16, Rayleigh=Ra, Prandtl=1.0)

    def test_bcs_and_divergence_after_solve(self):
        P = self._problem()
        u0 = P.u_exact(0.0, noise_level=1e-3)
        u1 = P.solve_system(u0, 0.025, u0, 0.0)
        u_hat = P.spec.transform(u1)
        # temperature plates
        T_bot = jnp.tensordot(jnp.asarray(P.zb.dirichlet_row(0.0), u_hat.dtype), u_hat[2], axes=(0, 1))
        T_top = jnp.tensordot(jnp.asarray(P.zb.dirichlet_row(1.0), u_hat.dtype), u_hat[2], axes=(0, 1))
        assert float(jnp.real(T_bot[0])) == pytest.approx(1.0, abs=1e-10)
        assert float(jnp.real(T_top[0])) == pytest.approx(0.0, abs=1e-10)
        # incompressibility (excluding tau lines)
        kx = jnp.asarray(P.xb.k)
        div = u_hat[0] * (1j * kx)[:, None] + jnp.tensordot(
            jnp.asarray(P._Dz_T, u_hat.dtype), u_hat[1], axes=(1, 1)
        ).T
        assert float(jnp.max(jnp.abs(div[:, :-2]))) < 1e-12

    def test_conductive_state_nusselt_is_one(self):
        P = self._problem()
        u0 = P.u_exact(0.0, noise_level=0.0)
        nus = P.compute_Nusselt_numbers(u0)
        for key in ('V', 't', 'b'):
            assert nus[key] == pytest.approx(1.0, abs=1e-8)

    def test_convection_sets_in_supercritical(self):
        desc = dict(
            problem_class=RayleighBenard,
            problem_params=dict(nx=32, nz=16, Rayleigh=2e6, Prandtl=1.0),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(num_nodes=3, QI='LU'),
            level_params=dict(dt=0.02, restol=-1),
            step_params=dict(maxiter=4),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        u0 = P.u_exact(0.0, noise_level=1e-3)
        uend, _ = c.run(u0, 0.0, 10.0)
        assert bool(jnp.isfinite(uend).all())
        nus = P.compute_Nusselt_numbers(uend)
        assert nus['V'] > 1.5, f'convection should raise Nu above 1, got {nus}'
        assert float(jnp.max(jnp.abs(uend[1]))) > 0.05, 'no convective velocities'


def test_rayleigh_benard_3d():
    """3D RBC: conductive Nu=1, divergence-free solves, stable integration
    with convective heat flux beyond onset."""
    from pysdc_tpu.models.rayleigh_benard import RayleighBenard3D
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    P = RayleighBenard3D(nx=16, ny=16, nz=12, Rayleigh=2e4)
    cond = P.u_exact(0.0, noise_level=0)
    nus = P.compute_Nusselt_numbers(cond)
    assert abs(nus['V'] - 1) < 1e-10 and abs(nus['t'] - 1) < 1e-10

    sol = P.solve_system(P.u_exact(0.0), 1e-3, cond, 0.0)
    assert float(jnp.max(jnp.abs(P.compute_divergence(sol)))) < 1e-12

    desc = dict(
        problem_class=RayleighBenard3D,
        problem_params=dict(nx=16, ny=16, nz=12, Rayleigh=2e4),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=2, QI='LU'),
        level_params=dict(dt=0.05, restol=-1),
        step_params=dict(maxiter=4),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P2 = c.MS[0].levels[0].prob
    uend, _ = c.run(P2.u_exact(0.0), 0.0, 0.5)
    assert bool(jnp.isfinite(uend).all())
    assert float(jnp.max(jnp.abs(P2.compute_divergence(uend)))) < 1e-10
    assert -0.05 < float(uend[3].min()) and float(uend[3].max()) < 1.05
