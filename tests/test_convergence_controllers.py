"""Convergence-controller tests: adaptivity, restarts, limiters, crash
policies (mirrors reference tests/test_convergence_controllers/*)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.convergence.adaptivity import Adaptivity, AdaptivityRK, AdaptivityResidual
from pysdc_tpu.convergence.crash import StopAtMaxRuntime, StopAtNan
from pysdc_tpu.convergence.step_size_limiter import StepSizeLimiter, StepSizeRounding
from pysdc_tpu.core.errors import ConvergenceError, ParameterError
from pysdc_tpu.models.dahlquist import Dahlquist
from pysdc_tpu.models.heat import HeatNDForced
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.runge_kutta import Cash_Karp
from pysdc_tpu.utils.stats import get_sorted


def _vdp_description(convergence_controllers, maxiter=4, dt=1e-2):
    return dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=dt, restol=-1),
        step_params=dict(maxiter=maxiter),
        convergence_controllers=convergence_controllers,
    )


def test_adaptivity_controls_error_on_van_der_pol():
    desc = _vdp_description({Adaptivity: {'e_tol': 1e-7}})
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 2.0)

    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert len(set(np.round(dts, 12))) > 3, 'step size never changed'
    assert max(dts) / min(dts) > 2, 'step size range too small for VdP'

    exact = P.u_exact(2.0)
    err = float(jnp.max(jnp.abs(uend - exact)))
    # global error should be in the ballpark of e_tol * nsteps
    assert err < 1e-7 * len(dts) * 50, err


def test_adaptivity_restarts_happen():
    desc = _vdp_description({Adaptivity: {'e_tol': 1e-9}}, dt=0.5)
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.5)
    restarts = sum(getattr(S.status, 'restarts_in_a_row', 0) >= 0 for S in c.MS)
    # the huge initial dt must have been rejected at least once
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert min(dts) < 0.5


def test_adaptivity_requires_e_tol_and_negative_restol():
    with pytest.raises(ParameterError):
        ControllerNonMPI(1, {'logger_level': 40}, _vdp_description({Adaptivity: {}}))
    desc = _vdp_description({Adaptivity: {'e_tol': 1e-7}})
    desc['level_params']['restol'] = 1e-10
    with pytest.raises(ParameterError):
        ControllerNonMPI(1, {'logger_level': 40}, desc)


def test_adaptivity_rk_cash_karp():
    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=Cash_Karp,
        sweeper_params={},
        level_params=dict(dt=1e-2, restol=-1),
        step_params=dict(maxiter=1),
        convergence_controllers={AdaptivityRK: {'e_tol': 1e-7, 'update_order': 5}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 2.0)
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert len(set(np.round(dts, 12))) > 3
    err = float(jnp.max(jnp.abs(uend - P.u_exact(2.0))))
    assert err < 1e-4, err


def test_step_size_limiter_enforced():
    desc = _vdp_description({Adaptivity: {'e_tol': 1e-7, 'dt_max': 0.02, 'dt_min': 1e-4}})
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    _, stats = c.run(P.u_exact(0.0), 0.0, 1.0)
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    # first dt is user-provided; all adapted ones respect the limits
    assert all(d <= 0.02 + 1e-12 for d in dts[1:]), max(dts[1:])


def test_step_size_rounding():
    assert StepSizeRounding._quantize(0.0123, 5, 1) == pytest.approx(0.010)
    assert StepSizeRounding._quantize(0.0173, 5, 1) == pytest.approx(0.015)


def test_stop_at_nan():
    desc = dict(
        problem_class=Dahlquist,
        problem_params=dict(lambdas=np.array([+50.0]), u0=1.0),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='PIC'),
        level_params=dict(dt=1.0, restol=-1),
        step_params=dict(maxiter=50),
        convergence_controllers={StopAtNan: {'thresh': 1e10}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    with pytest.raises(ConvergenceError):
        c.run(P.u_exact(0.0), 0.0, 10.0)


def test_stop_at_max_runtime():
    desc = _vdp_description({StopAtMaxRuntime: {'max_runtime': 1e-6}})
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    with pytest.raises(ConvergenceError):
        c.run(P.u_exact(0.0), 0.0, 1.0)


def test_adaptive_collocation_reaches_final_rule_accuracy():
    """Switching 2->4 nodes mid-step must land on the 4-node collocation
    solution."""
    from pysdc_tpu.convergence.adaptive_collocation import AdaptiveCollocation

    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=4, nvars=255, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-9, dt=0.1),
        step_params=dict(maxiter=50),
        convergence_controllers={AdaptiveCollocation: {'num_nodes': [2, 4], 'restol': [1e-7, 1e-9]}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.3)

    desc2 = {k: v for k, v in desc.items() if k != 'convergence_controllers'}
    desc2['sweeper_params'] = dict(desc['sweeper_params'], num_nodes=4)
    c2 = ControllerNonMPI(1, {'logger_level': 40}, desc2)
    u2, _ = c2.run(P.u_exact(0.0), 0.0, 0.3)
    assert float(jnp.max(jnp.abs(uend - u2))) < 1e-8


def test_adaptivity_collocation_controls_step_size():
    from pysdc_tpu.convergence.adaptivity import AdaptivityCollocation

    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=4, nvars=255, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=60),
        convergence_controllers={
            AdaptivityCollocation: {'e_tol': 1e-7, 'adaptive_coll_params': {'num_nodes': [2, 3]}}
        },
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.3)
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert len(set(f'{d:.4f}' for d in dts)) > 1, 'step size never changed'
    assert all(0.001 < d < 0.2 for d in dts)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(sum(dts)))))
    assert err < 5e-4
