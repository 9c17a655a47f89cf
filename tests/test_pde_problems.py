"""PDE problem tests: advection, Allen-Cahn, Gray-Scott, NLS
(mirrors reference tests/test_problems.py strategy: compare against exact or
scipy reference solutions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.advection import AdvectionND
from pysdc_tpu.models.allen_cahn import (
    AllenCahnFront1D,
    AllenCahnFront1DSemiImplicit,
    AllenCahnPeriodicND,
    AllenCahnPeriodicSemiImplicitND,
)
from pysdc_tpu.models.gray_scott import GrayScott, GrayScottLinearIMEX
from pysdc_tpu.models.nls import NonlinearSchroedinger
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.stats import get_sorted


def _run(problem_class, problem_params, sweeper_class, sweeper_params, dt, Tend, maxiter=20, restol=1e-10):
    desc = dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=sweeper_class,
        sweeper_params=sweeper_params,
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    return P, uend, stats


def test_advection_periodic_upwind_and_center():
    for stencil, order in (('upwind', 1), ('center', 2), ('center', 4)):
        P, uend, _ = _run(
            AdvectionND,
            dict(nvars=256, c=1.0, freq=2, stencil_type=stencil, order=order),
            GenericImplicit,
            dict(num_nodes=3, QI='LU'),
            0.05,
            0.5,
        )
        err = float(jnp.max(jnp.abs(uend - P.u_exact(0.5))))
        dx = 1.0 / 256
        # spatial discretization error dominates
        assert err < 50 * (2 * np.pi * dx) ** order, (stencil, order, err)


def test_advection_2d():
    P, uend, _ = _run(
        AdvectionND,
        dict(nvars=(64, 64), c=0.5, freq=2, order=4),
        GenericImplicit,
        dict(num_nodes=3, QI='LU'),
        0.05,
        0.3,
    )
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.3))))
    assert err < 1e-4, err


@pytest.mark.parametrize('problem_class', [AllenCahnFront1D, AllenCahnFront1DSemiImplicit])
def test_allen_cahn_front_tracks_exact_wave(problem_class):
    P, uend, stats = _run(
        problem_class,
        dict(nvars=255, dw=-0.04, eps=0.04, newton_tol=1e-12),
        GenericImplicit if problem_class is AllenCahnFront1D else IMEXSweeper,
        dict(num_nodes=3, QI='LU'),
        0.001,
        0.006,
    )
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.006))))
    assert err < 5e-4, err
    iters = [v for _, v in get_sorted(stats, type='niter')]
    assert all(i < 20 for i in iters), iters


def test_allen_cahn_periodic_interface_shrinks():
    P, uend, _ = _run(
        AllenCahnPeriodicSemiImplicitND,
        dict(nvars=(64, 64), eps=0.04, radius=0.25),
        IMEXSweeper,
        dict(num_nodes=3, QI='LU'),
        1e-3,
        4e-3,
    )
    u0 = P.u_exact(0.0)
    # interface area (sum of phase field) must shrink under curvature flow
    assert float(jnp.sum(uend)) < float(jnp.sum(u0))
    assert np.isfinite(np.asarray(uend)).all()
    # and track the sharp-interface radius approximation reasonably
    approx = P.u_exact(4e-3)
    assert float(jnp.max(jnp.abs(uend - approx))) < 0.5


def test_allen_cahn_fully_implicit_matches_imex():
    common = dict(nvars=(32, 32), eps=0.08, radius=0.25, newton_tol=1e-12)
    P1, u1, _ = _run(AllenCahnPeriodicND, common, GenericImplicit, dict(num_nodes=3, QI='LU'), 1e-3, 3e-3)
    P2, u2, _ = _run(AllenCahnPeriodicSemiImplicitND, common, IMEXSweeper, dict(num_nodes=3, QI='LU'), 1e-3, 3e-3)
    assert float(jnp.max(jnp.abs(u1 - u2))) < 1e-7


@pytest.mark.parametrize('problem_class', [GrayScott, GrayScottLinearIMEX])
def test_gray_scott_against_scipy_reference(problem_class):
    P, uend, _ = _run(
        problem_class,
        dict(nvars=(32,), Du=1e-4, Dv=1e-5, A=0.04, B=0.1, L=2.0),
        IMEXSweeper,
        dict(num_nodes=3, QI='LU'),
        0.5,
        2.0,
    )
    u0 = P.u_exact(0.0)
    from pysdc_tpu.core.state import f_total

    ref = P.generate_scipy_reference_solution(
        lambda tt, u: np.asarray(f_total(P.eval_f(jnp.asarray(u), tt))), 2.0, u0, 0.0
    )
    err = float(jnp.max(jnp.abs(uend - ref)))
    assert err < 1e-7, err


def test_nls_matches_exact_breather():
    P, uend, _ = _run(
        NonlinearSchroedinger,
        dict(nvars=(64, 64), c=1.0),
        IMEXSweeper,
        dict(num_nodes=3, QI='LU'),
        0.01,
        0.05,
        maxiter=50,
        restol=1e-11,
    )
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.05))))
    assert err < 1e-5, err


def test_nls_linear_case_exact():
    P, uend, _ = _run(
        NonlinearSchroedinger,
        dict(nvars=(32,), c=0.0),
        IMEXSweeper,
        dict(num_nodes=4, QI='LU'),
        0.05,
        0.2,
        maxiter=50,
        restol=1e-12,
    )
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.2))))
    assert err < 1e-9, err


def test_multi_implicit_sweeper_matches_fully_implicit():
    from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicMultiImplicitND
    from pysdc_tpu.sweepers.multi_implicit import MultiImplicitSweeper

    common = dict(nvars=(32, 32), eps=0.08, radius=0.25, newton_tol=1e-12)
    P1, u1, _ = _run(
        AllenCahnPeriodicMultiImplicitND, common, MultiImplicitSweeper,
        dict(num_nodes=3, Q1='LU', Q2='LU'), 1e-3, 3e-3, maxiter=30, restol=1e-11,
    )
    P2, u2, _ = _run(
        AllenCahnPeriodicND, common, GenericImplicit, dict(num_nodes=3, QI='LU'),
        1e-3, 3e-3, maxiter=30, restol=1e-11,
    )
    assert float(jnp.max(jnp.abs(u1 - u2))) < 1e-10


# ----------------------------------------------------------------------
# Round-3 depth variants: AC Finel, Gray-Scott multi-implicit, Quench refs
# ----------------------------------------------------------------------
def test_allen_cahn_finel_tracks_traveling_front():
    """Finel's trick keeps the discrete traveling wave exact on the grid:
    the front must move at v = 3*sqrt(2)*eps*dw without lattice pinning,
    staying close to the tanh profile even on a coarse grid."""
    from pysdc_tpu.models.allen_cahn import AllenCahnFront1D, AllenCahnFront1DFinel

    common = dict(nvars=127, dw=-0.04, eps=0.04, newton_tol=1e-12)
    P_f, u_f, _ = _run(
        AllenCahnFront1DFinel, common, GenericImplicit, dict(num_nodes=3, QI='LU'),
        1e-3, 1e-2, maxiter=40, restol=1e-11,
    )
    err_f = float(jnp.max(jnp.abs(u_f - P_f.u_exact(1e-2))))
    assert err_f < 5e-4, err_f
    # and it must genuinely differ from the standard discretization
    P_s, u_s, _ = _run(
        AllenCahnFront1D, common, GenericImplicit, dict(num_nodes=3, QI='LU'),
        1e-3, 1e-2, maxiter=40, restol=1e-11,
    )
    assert float(jnp.max(jnp.abs(u_f - u_s))) > 1e-8


def test_gray_scott_multi_implicit_matches_imex():
    """Both multi-implicit splittings converge to the same trajectory as the
    IMEX variant (collocation fixed point is splitting-independent)."""
    from pysdc_tpu.models.gray_scott import (
        GrayScottMultiImplicit,
        GrayScottMultiImplicitLinear,
    )
    from pysdc_tpu.sweepers.multi_implicit import MultiImplicitSweeper

    common = dict(nvars=(32,), Du=1e-4, Dv=1e-5, A=0.04, B=0.1, L=2.0)
    _, u_imex, _ = _run(
        GrayScott, common, IMEXSweeper, dict(num_nodes=3, QI='LU'),
        0.5, 2.0, maxiter=30, restol=1e-11,
    )
    for cls in (GrayScottMultiImplicit, GrayScottMultiImplicitLinear):
        _, u_mi, _ = _run(
            cls, dict(common, newton_tol=1e-12), MultiImplicitSweeper,
            dict(num_nodes=3, Q1='LU', Q2='LU'), 0.5, 2.0, maxiter=30, restol=1e-11,
        )
        assert float(jnp.max(jnp.abs(u_mi - u_imex))) < 1e-8, cls.__name__


def test_gray_scott_reaction_newton_solves_pointwise_system():
    """solve_system_2 really solves u - factor*R(u) = rhs."""
    from pysdc_tpu.models.gray_scott import GrayScottMultiImplicit

    P = GrayScottMultiImplicit(nvars=(16, 16), newton_tol=1e-13)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(0.5 + 0.1 * rng.standard_normal((2, 16, 16)))
    u = P.solve_system_2(rhs, 0.37, rhs, 0.0)
    resid = u - 0.37 * np.asarray(P._reaction(u)) - np.asarray(rhs)
    assert np.abs(resid).max() < 1e-11


def test_quench_reference_sol_types_agree():
    """'SDC' and 'DIRK' reference generators agree with the scipy BDF one
    (reference Quench.py:364-476 offers the same three)."""
    from pysdc_tpu.models.quench import Quench

    t = 10.0
    u_ref = {}
    for kind in ('scipy', 'SDC', 'DIRK'):
        P = Quench(nvars=64, reference_sol_type=kind)
        u_ref[kind] = np.asarray(P.u_exact(t))
    assert np.abs(u_ref['SDC'] - u_ref['scipy']).max() < 1e-4
    assert np.abs(u_ref['DIRK'] - u_ref['scipy']).max() < 1e-4
