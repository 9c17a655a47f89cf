"""ParaDiag controller tests (mirrors reference tests/test_controllers
ParaDiag suites): convergence rate ~alpha, equivalence with serial SDC,
nonlinear problems via averaged Jacobians."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.core.errors import ParameterError
from pysdc_tpu.models.dahlquist import Dahlquist
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.parallel.paradiag import ParaDiagController
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.paradiag import QDiagonalization
from pysdc_tpu.utils.stats import get_sorted


def _desc(problem_class, problem_params, dt=0.1, restol=1e-10, maxiter=20, M=3):
    return dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=QDiagonalization,
        sweeper_params=dict(num_nodes=M, quad_type='RADAU-RIGHT'),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )


def test_paradiag_matches_serial_sdc_dahlquist():
    lams = np.linspace(-8, -0.2, 16)
    desc = _desc(Dahlquist, dict(lambdas=lams, u0=1.0))
    c = ParaDiagController(4, {'logger_level': 40, 'alpha': 1e-4}, desc)
    P = c.template.levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.4)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    assert max(iters) <= 5, iters

    sdc = dict(desc)
    sdc['sweeper_class'] = GenericImplicit
    sdc['sweeper_params'] = dict(num_nodes=3, QI='LU')
    cs = ControllerNonMPI(1, {'logger_level': 40}, sdc)
    us, _ = cs.run(P.u_exact(0.0), 0.0, 0.4)
    assert float(jnp.max(jnp.abs(uend - us))) < 1e-9


def test_paradiag_heat():
    desc = _desc(HeatND, dict(nvars=64, nu=0.1, freq=2, bc='periodic'), dt=0.05)
    c = ParaDiagController(4, {'logger_level': 40, 'alpha': 1e-4}, desc)
    P = c.template.levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.2)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.2))))
    assert err < 1e-7, err
    assert max(v for _, v in get_sorted(stats, type='niter')) <= 5


def test_paradiag_convergence_rate_improves_with_smaller_alpha():
    lams = np.linspace(-4, -0.5, 8)
    iters = {}
    for alpha in (1e-2, 1e-6):
        desc = _desc(Dahlquist, dict(lambdas=lams, u0=1.0), restol=1e-11)
        c = ParaDiagController(4, {'logger_level': 40, 'alpha': alpha}, desc)
        P = c.template.levels[0].prob
        _, stats = c.run(P.u_exact(0.0), 0.0, 0.4)
        iters[alpha] = max(v for _, v in get_sorted(stats, type='niter'))
    assert iters[1e-6] < iters[1e-2], iters


def test_paradiag_nonlinear_van_der_pol():
    """Averaged-Jacobian ParaDiag on a mildly nonlinear problem."""
    desc = _desc(VanDerPol, dict(mu=1.0, u0=(2.0, 0.0), newton_tol=1e-12), dt=0.02, maxiter=50)
    c = ParaDiagController(4, {'logger_level': 40, 'alpha': 1e-3}, desc)
    P = c.template.levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.4)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.4))))
    assert err < 1e-6, err


def test_paradiag_requires_alpha():
    desc = _desc(Dahlquist, dict(lambdas=np.array([-1.0]), u0=1.0))
    with pytest.raises(ParameterError):
        ParaDiagController(4, {'logger_level': 40}, desc)


def test_qdiagonalization_as_direct_sdc_solver():
    """SDC mode (ignore_ic=False): one update solves the collocation problem."""
    from pysdc_tpu.core.level import Level

    prob = Dahlquist(lambdas=np.linspace(-3, -0.5, 8), u0=1.0)
    sweep = QDiagonalization({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'ignore_ic': False, 'update_f_evals': True})
    lvl = Level(prob, sweep, dict(dt=0.2, restol=1e-12))
    lvl.status.time = 0.0
    lvl.predict(prob.u_exact(0.0))
    lvl.update_nodes()
    lvl.compute_residual()
    assert float(lvl.status.residual) < 1e-12, float(lvl.status.residual)


def test_paradiag_time_sharded_matches_unsharded():
    """P5 over the device mesh: the (L, M, *shape) block sharded on the
    'time' axis (weighted DFT matmuls carry the collectives, per-step solves
    stay chip-local) matches the unsharded controller bitwise-tight."""
    from pysdc_tpu.parallel.mesh import make_mesh

    desc = _desc(HeatND, dict(nvars=64, nu=0.1, freq=2, bc='periodic'), dt=0.05)
    P = 8
    cp = {'logger_level': 40, 'alpha': 1e-4}
    ref = ParaDiagController(P, cp, desc)
    prob = ref.template.levels[0].prob
    u0 = prob.u_exact(0.0)
    u_ref, s_ref = ref.run(u0, 0.0, P * 0.05)
    it_ref = [v for _, v in get_sorted(s_ref, type='niter')]

    mesh = make_mesh(n_time=8, n_space=1)
    sh = ParaDiagController(P, cp, desc, mesh=mesh)
    assert sh._time_sharded
    u_sh, s_sh = sh.run(u0, 0.0, P * 0.05)
    it_sh = [v for _, v in get_sorted(s_sh, type='niter')]

    assert it_ref == it_sh, f'iteration counts differ: {it_ref} vs {it_sh}'
    assert float(jnp.max(jnp.abs(u_ref - u_sh))) < 1e-11
