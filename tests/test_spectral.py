"""Spectral subsystem tests: bases, Chebyshev heat, Burgers, Rayleigh-Benard
(mirrors reference tests of spectral_helper / generic_spectral / RBC)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.rayleigh_benard import RayleighBenard
from pysdc_tpu.models.spectral_problems import Burgers1D, Heat2DChebyshev, HeatChebyshev1D
from pysdc_tpu.ops.spectral import FourierBase1D, TensorProductSpectral, UltrasphericalBase1D
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
    assert float(jnp.max(jnp.abs(jnp.diff(u1[0])))) > float(
        jnp.max(jnp.abs(jnp.diff(P.u_exact(0.0)[0])))
    )


def test_neumann_row_matches_polynomial_derivative():
    z = UltrasphericalBase1D(16, 0.0, 2.0)
    x = jnp.asarray(z.nodes)
    u = x**3 - x  # u' = 3x^2 - 1: u'(0) = -1, u'(2) = 11
    a = np.asarray(z.transform(u[None], axis=1)[0])
    assert z.neumann_row(0.0) @ a == pytest.approx(-1.0, abs=1e-10)
    assert z.neumann_row(2.0) @ a == pytest.approx(11.0, abs=1e-10)


def test_heat2d_chebyshev_two_coupled_axes():
    """Two Kronecker-coupled ultraspherical axes (not expressible as
    batched per-mode solves): spectral eval_f accuracy + SDC convergence."""
    P = Heat2DChebyshev(nx=24, nz=24, nu=1.0)
    u0 = P.u_exact(0.0)
    lam = -np.pi**2 / 2.0
    assert float(jnp.max(jnp.abs(P.eval_f(u0, 0.0) - lam * u0))) < 1e-9

    desc = dict(
        problem_class=Heat2DChebyshev,
        problem_params=dict(nx=24, nz=24, nu=1.0),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-11),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    uend, _ = c.run(u0, 0.0, 0.25)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(0.25)))) < 1e-7


def test_neumann_bc_insulated_heat():
    """Insulated rod: Neumann(0) both ends; mean is conserved and the
    solution decays to the mean."""
    spec = TensorProductSpectral()
    zb = spec.add_axis('z', UltrasphericalBase1D(32, 0.0, 1.0))
    spec.add_component('u')
    spec.add_L_term('u', 'u', coeff=-1.0, derivs={'z': 2})
    spec.add_M_term('u', 'u')
    spec.add_BC('u', 'u', axis='z', kind='neumann', x=0.0, v=0.0, line=-2)
    spec.add_BC('u', 'u', axis='z', kind='neumann', x=1.0, v=0.0, line=-1)
    spec.setup()

    x = jnp.asarray(zb.nodes)
    u = (2.0 + jnp.cos(np.pi * x))[None]  # mean 2, du/dx = 0 at both ends
    v = u
    for _ in range(200):
        v = spec.solve_shifted(v, 0.05)
    assert float(jnp.max(jnp.abs(v - 2.0))) < 1e-8


def test_axis_order_is_arbitrary():
    """The same heat problem declared with (Fourier, ultraspherical) and
    (ultraspherical, Fourier) axis orders gives transposed-identical
    solves."""

    def build(order):
        spec = TensorProductSpectral()
        if order == 'fu':
            spec.add_axis('x', FourierBase1D(16, 0.0, 1.0))
            spec.add_axis('z', UltrasphericalBase1D(12, 0.0, 1.0))
        else:
            spec.add_axis('z', UltrasphericalBase1D(12, 0.0, 1.0))
            spec.add_axis('x', FourierBase1D(16, 0.0, 1.0))
        spec.add_component('u')
        spec.add_L_term('u', 'u', coeff=-1.0, derivs={'x': 2})
        spec.add_L_term('u', 'u', coeff=-1.0, derivs={'z': 2})
        spec.add_M_term('u', 'u')
        spec.add_BC('u', 'u', axis='z', kind='dirichlet', x=0.0, v=0.0, line=-2)
        spec.add_BC('u', 'u', axis='z', kind='dirichlet', x=1.0, v=0.0, line=-1)
        return spec.setup()

    s1, s2 = build('fu'), build('uf')
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((1, 16, 12)))
    a = s1.solve_shifted(u, 0.1)
    b = s2.solve_shifted(jnp.transpose(u, (0, 2, 1)), 0.1)
    assert float(jnp.max(jnp.abs(a - jnp.transpose(b, (0, 2, 1))))) < 1e-12
    La = s1.apply_L(u)
    Lb = s2.apply_L(jnp.transpose(u, (0, 2, 1)))
    assert float(jnp.max(jnp.abs(La - jnp.transpose(Lb, (0, 2, 1))))) < 1e-9


def test_declarative_matches_hand_assembly():
    """Automatic ultraspherical conversion reproduces the hand-built
    U12 @ D1 / U02 ladders of the variable-order RBC rows."""
    nz = 10
    spec = TensorProductSpectral()
    zb = spec.add_axis('z', UltrasphericalBase1D(nz, 0.0, 1.0))
    spec.add_component('v', 'p')
    spec.add_L_term('v', 'p', derivs={'z': 1})          # dp/dz in a C^(2) row
    spec.add_L_term('v', 'v', coeff=-0.5, derivs={'z': 2})
    spec.add_M_term('v', 'v')
    spec.add_L_term('p', 'v', derivs={'z': 1})          # dv/dz in a C^(1) row
    spec.setup()

    L = np.asarray(spec.L_all[0])
    U12, D1, D2 = zb.conv_matrix(1, 2), zb.diff_matrix(1), zb.diff_matrix(2)
    np.testing.assert_allclose(L[:nz, nz:], U12 @ D1, atol=1e-13)
    np.testing.assert_allclose(L[:nz, :nz], -0.5 * D2, atol=1e-13)
    np.testing.assert_allclose(L[nz:, :nz], D1, atol=1e-13)
    M = np.asarray(spec.M_all[0])
    np.testing.assert_allclose(M[:nz, :nz], zb.conv_matrix(0, 2), atol=1e-13)


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
