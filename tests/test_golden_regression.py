"""Golden-series regression gates for ~10 flagship configurations.

Counterpart of the reference's DataChecker flow (helpers/testing.py:15-105 +
committed _dataRef.json files): each config records its iteration counts and
solution functionals against ``tests/golden_regression.json``.  Numerical
drift between rounds fails here even when order/parity gates still pass.

Re-baseline intentionally:  PYSDC_TPU_WRITE_GOLDEN=1 pytest tests/test_golden_regression.py
then commit the JSON diff.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.utils.golden import GoldenStore
from pysdc_tpu.utils.stats import get_sorted

GOLDEN = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden_regression.json'))


@pytest.fixture(scope='module')
def golden():
    yield GOLDEN
    GOLDEN.flush()


def _run(desc, Tend, num_procs=1, controller_params=None):
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI

    cp = {'logger_level': 40, **(controller_params or {})}
    c = ControllerNonMPI(num_procs, cp, desc)
    prob = c.MS[0].levels[0].prob
    uend, stats = c.run(prob.u_exact(0.0), 0.0, Tend)
    return prob, uend, stats


def _niter(stats):
    return [int(v) for _, v in get_sorted(stats, type='niter')]


def test_heat1d_forced_sdc(golden):
    from pysdc_tpu.models.heat import HeatNDForced
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nvars=1023, nu=0.1, freq=4, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=5, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-10, dt=0.1),
        step_params=dict(maxiter=20),
    )
    prob, uend, stats = _run(desc, 0.4)
    err = float(jnp.max(jnp.abs(uend - prob.u_exact(0.4))))
    assert err < 2e-5  # tutorial step-2 gate
    golden.check('heat1d_forced/niter', _niter(stats))
    golden.check('heat1d_forced/err', [err], rtol=1e-6, atol=1e-14)
    res = [float(v) for _, v in get_sorted(stats, type='residual_post_step')]
    golden.check('heat1d_forced/residuals', res, rtol=1e-3, atol=1e-14)


def test_heat2d_pfasst_virtual(golden):
    from pysdc_tpu.models.heat import HeatND
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[(32, 32), (16, 16)], bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=5e-10, dt=0.125),
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=6, periodic=True),
    )
    prob, uend, stats = _run(desc, 1.0, num_procs=4, controller_params={'predict_type': 'pfasst_burnin'})
    golden.check('heat2d_pfasst/niter', _niter(stats))
    golden.check('heat2d_pfasst/unorm', [float(jnp.linalg.norm(uend))], rtol=1e-9)


def test_advection_implicit(golden):
    from pysdc_tpu.models.advection import AdvectionND
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=AdvectionND,
        problem_params=dict(nvars=64, c=1.0, freq=2, order=4),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=30),
    )
    prob, uend, stats = _run(desc, 0.2)
    err = float(jnp.max(jnp.abs(uend - prob.u_exact(0.2))))
    golden.check('advection/niter', _niter(stats))
    golden.check('advection/err', [err], rtol=1e-5, atol=1e-14)


def test_allen_cahn_2d_imex(golden):
    from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicSemiImplicitND
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    desc = dict(
        problem_class=AllenCahnPeriodicSemiImplicitND,
        problem_params=dict(nvars=(64, 64), eps=0.04, radius=0.25),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-9, dt=1e-3),
        step_params=dict(maxiter=30),
    )
    prob, uend, stats = _run(desc, 3e-3)
    golden.check('allen_cahn_2d/niter', _niter(stats))
    golden.check('allen_cahn_2d/mass', [float(jnp.sum(uend)) / uend.size], rtol=1e-8)


def test_van_der_pol_adaptivity(golden):
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.odes import VanDerPol
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=1e-2, restol=-1),
        step_params=dict(maxiter=4),
        convergence_controllers={Adaptivity: {'e_tol': 1e-7}},
    )
    prob, uend, stats = _run(desc, 0.3)
    dts = [float(v) for _, v in get_sorted(stats, type='dt', recomputed=False)]
    golden.check('vdp_adaptivity/dt_series', dts, rtol=1e-6)
    golden.check('vdp_adaptivity/uend', [float(x) for x in uend], rtol=1e-7)


def test_paradiag_heat(golden):
    from pysdc_tpu.models.heat import HeatND
    from pysdc_tpu.parallel.paradiag import ParaDiagController

    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT'),
        level_params=dict(restol=1e-10, dt=0.05),
        step_params=dict(maxiter=50),
    )
    c = ParaDiagController(4, {'logger_level': 40, 'alpha': 1e-4}, desc)
    prob = c.template.levels[0].prob
    uend, stats = c.run(prob.u_exact(0.0), 0.0, 0.2)
    golden.check('paradiag_heat/niter', _niter(stats))
    golden.check('paradiag_heat/err', [float(jnp.max(jnp.abs(uend - prob.u_exact(0.2))))], rtol=1e-4, atol=1e-13)


def test_gray_scott_imex(golden):
    from pysdc_tpu.models.gray_scott import GrayScott
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    desc = dict(
        problem_class=GrayScott,
        problem_params=dict(nvars=(64, 64), num_blobs=1),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-10, dt=1.0),
        step_params=dict(maxiter=30),
    )
    prob, uend, stats = _run(desc, 2.0)
    golden.check('gray_scott/niter', _niter(stats))
    golden.check('gray_scott/norms', [float(jnp.linalg.norm(uend[0])), float(jnp.linalg.norm(uend[1]))], rtol=1e-8)


def test_rayleigh_benard_step(golden):
    from pysdc_tpu.models.rayleigh_benard import RayleighBenard
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    desc = dict(
        problem_class=RayleighBenard,
        problem_params=dict(nx=32, nz=16, Rayleigh=2e4, Prandtl=1.0),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=2, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-8, dt=0.05),
        step_params=dict(maxiter=20),
    )
    prob, uend, stats = _run(desc, 0.1)
    golden.check('rbc/niter', _niter(stats))
    golden.check('rbc/component_norms', [float(jnp.linalg.norm(uend[i])) for i in range(uend.shape[0])], rtol=1e-6)


def test_var_diffusion_sparse(golden):
    from pysdc_tpu.models.var_diffusion import VarCoeffDiffusion2D
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=VarCoeffDiffusion2D,
        problem_params=dict(nvars=(32, 32), coeff_fn=lambda x, y: 1.0 + 0.5 * np.sin(2 * np.pi * x) * np.cos(np.pi * y)),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-9, dt=0.01),
        step_params=dict(maxiter=30),
    )
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI

    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    prob = c.MS[0].levels[0].prob
    # no closed-form u_exact: gaussian bump initial condition on the grid
    x = np.linspace(0, 1, 34)[1:-1]
    xx, yy = np.meshgrid(x, x, indexing='ij')
    u0 = jnp.asarray(np.exp(-80 * ((xx - 0.5) ** 2 + (yy - 0.5) ** 2)))
    uend, stats = c.run(u0, 0.0, 0.02)
    golden.check('var_diffusion_sparse/niter', _niter(stats))
    golden.check('var_diffusion_sparse/unorm', [float(jnp.linalg.norm(uend))], rtol=1e-8)


def test_rk_cash_karp_vdp(golden):
    from pysdc_tpu.models.odes import VanDerPol
    from pysdc_tpu.sweepers.runge_kutta import Cash_Karp

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=1.0, u0=(2.0, 0.0), newton_tol=1e-12),
        sweeper_class=Cash_Karp,
        sweeper_params=dict(),
        level_params=dict(dt=0.05, restol=-1),
        step_params=dict(maxiter=1),
    )
    prob, uend, stats = _run(desc, 0.5)
    golden.check('rk_cash_karp/uend', [float(x) for x in uend], rtol=1e-9)


def test_allen_cahn_front_finel(golden):
    from pysdc_tpu.models.allen_cahn import AllenCahnFront1DFinel
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=AllenCahnFront1DFinel,
        problem_params=dict(nvars=127, dw=-0.04, eps=0.04, newton_tol=1e-12),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='LU'),
        level_params=dict(restol=1e-11, dt=1e-3),
        step_params=dict(maxiter=40),
    )
    prob, uend, stats = _run(desc, 8e-3)
    err = float(jnp.max(jnp.abs(uend - prob.u_exact(8e-3))))
    assert err < 5e-4
    golden.check('ac_front_finel/niter', _niter(stats))
    golden.check('ac_front_finel/err', [err], rtol=1e-5, atol=1e-14)


def test_gray_scott_multi_implicit(golden):
    from pysdc_tpu.models.gray_scott import GrayScottMultiImplicit
    from pysdc_tpu.sweepers.multi_implicit import MultiImplicitSweeper

    desc = dict(
        problem_class=GrayScottMultiImplicit,
        problem_params=dict(nvars=(64,), Du=1e-4, Dv=1e-5, A=0.04, B=0.1, L=2.0, newton_tol=1e-12),
        sweeper_class=MultiImplicitSweeper,
        sweeper_params=dict(num_nodes=3, Q1='LU', Q2='LU'),
        level_params=dict(restol=1e-11, dt=0.5),
        step_params=dict(maxiter=30),
    )
    prob, uend, stats = _run(desc, 2.0)
    golden.check('gray_scott_mi/niter', _niter(stats))
    golden.check('gray_scott_mi/u_slice', [float(v) for v in np.asarray(uend[0, ::16])], rtol=1e-8, atol=1e-12)
    golden.check('gray_scott_mi/v_slice', [float(v) for v in np.asarray(uend[1, ::16])], rtol=1e-8, atol=1e-12)


def test_quench_runaway(golden):
    from pysdc_tpu.models.quench import Quench
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=Quench,
        problem_params=dict(nvars=128, newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='IE'),
        level_params=dict(restol=1e-9, dt=5.0),
        step_params=dict(maxiter=50),
    )
    prob, uend, stats = _run(desc, 20.0)
    golden.check('quench/niter', _niter(stats))
    golden.check('quench/u_max', [float(jnp.max(uend))], rtol=1e-7, atol=1e-12)
