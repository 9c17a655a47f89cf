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


# ----------------------------------------------------------------------
# within-Q extrapolation estimate + adaptivity (reference
# estimate_extrapolation_error.py:395, adaptivity.py:740)
# ----------------------------------------------------------------------
def _within_q_estimate(dt, num_nodes, quad_type):
    """Plant a smooth exact solution at the collocation nodes and read the
    within-Q extrapolation estimate (mirrors the reference's
    tests/test_convergence_controllers/test_extrapolation_within_Q.py)."""
    from pysdc_tpu.convergence.estimate_extrapolation_error import (
        EstimateExtrapolationErrorWithinQ,
    )
    from pysdc_tpu.core.state import LevelState

    desc = dict(
        problem_class=Dahlquist,
        problem_params=dict(lambdas=[-1.0]),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=num_nodes, quad_type=quad_type, QI='IE'),
        level_params=dict(dt=dt, restol=1.0),
        step_params=dict(maxiter=0),
        convergence_controllers={EstimateExtrapolationErrorWithinQ: {}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    step = c.MS[0]
    lvl = step.levels[0]
    step.status.slot = 0
    step.status.iter = 1
    lvl.status.time = 0.0
    lvl.status.residual = 0.0
    lvl.predict(lvl.prob.u_exact(0.0))

    # a random degree-20 polynomial (all derivatives generic), the
    # reference's polynomial_testequation with degree=20
    poly = np.random.default_rng(26266).standard_normal(21)
    ts = np.concatenate([[0.0], np.asarray(lvl.sweep.coll.nodes) * dt])
    vals = jnp.asarray(np.polyval(poly, ts))[:, None]
    lvl.state = LevelState(u=vals.astype(lvl.state.u.dtype), f=lvl.state.f, tau=lvl.state.tau)

    est = next(
        C for C in c.convergence_controllers if type(C).__name__ == 'EstimateExtrapolationErrorWithinQ'
    )
    est.post_iteration_processing(c, step)
    return float(lvl.status.error_extrapolation_estimate)


@pytest.mark.parametrize('quad_type', ['RADAU-RIGHT', 'GAUSS'])
@pytest.mark.parametrize('num_nodes', [2, 3, 4])
def test_extrapolation_within_q_order(num_nodes, quad_type):
    """The within-Q estimate converges with the stage order (num_nodes),
    the gate the reference pins in test_extrapolation_within_Q.py."""
    dts = np.logspace(-1, -3, 10)
    errs = np.array([_within_q_estimate(dt, num_nodes, quad_type) for dt in dts])
    mask = (errs < 1e-1) & (errs > 1e-12)
    order = np.log(errs[mask][1:] / errs[mask][:-1]) / np.log(dts[mask][1:] / dts[mask][:-1])
    assert np.isclose(np.mean(order), num_nodes, atol=0.5), (quad_type, num_nodes, np.mean(order))


def test_adaptivity_extrapolation_within_q_van_der_pol():
    """AdaptivityExtrapolationWithinQ controls the error of a converged
    collocation solve (reference adaptivity.py:740): dt adapts, restarts
    fire on overshoot, and the global error tracks e_tol."""
    from pysdc_tpu.convergence.adaptivity import AdaptivityExtrapolationWithinQ

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-11),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(dt=1e-2, restol=1e-10),
        step_params=dict(maxiter=30),
        convergence_controllers={AdaptivityExtrapolationWithinQ: {'e_tol': 1e-6}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 1.0)

    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert len(set(np.round(dts, 12))) > 3, 'step size never changed'
    ests = [v for _, v in get_sorted(stats, type='error_extrapolation_estimate', recomputed=False)]
    assert ests and max(ests) < 1e-6 * 1.01, 'accepted steps must respect e_tol'

    exact = P.u_exact(1.0)
    err = float(jnp.max(jnp.abs(uend - exact)))
    assert err < 1e-6 * len(dts) * 50, err


# ----------------------------------------------------------------------
# lossy-compression error injection (reference projects/compression/order.py)
# ----------------------------------------------------------------------
@pytest.mark.parametrize('abs_bound,ok', [(1e-12, True), (1e-2, False)])
def test_compression_error_bound_controls_accuracy(abs_bound, ok):
    """Round-tripping the iterates through a lossy compressor must leave the
    solution untouched when the error bound sits below discretization error,
    and floor the accuracy near the bound when it dominates — the trade-off
    the reference's compression project studies."""
    from pysdc_tpu.convergence.compression import Compression

    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nvars=63, nu=0.1, freq=2, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-10),
        step_params=dict(maxiter=30),
    )
    c_ref = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c_ref.MS[0].levels[0].prob
    u_ref, _ = c_ref.run(P.u_exact(0.0), 0.0, 0.25)
    err_ref = float(jnp.max(jnp.abs(u_ref - P.u_exact(0.25))))

    desc_c = {**desc, 'convergence_controllers': {Compression: {'abs_bound': abs_bound}}}
    c = ControllerNonMPI(1, {'logger_level': 40}, desc_c)
    u_c, _ = c.run(P.u_exact(0.0), 0.0, 0.25)
    err_c = float(jnp.max(jnp.abs(u_c - P.u_exact(0.25))))

    if ok:
        # bound far below discretization error: accuracy unchanged
        assert err_c < 2 * err_ref + 1e-11, (err_c, err_ref)
    else:
        # bound dominates: the error floors at the compression scale
        assert err_c > 10 * err_ref, (err_c, err_ref)
        assert err_c < 50 * abs_bound, (err_c, abs_bound)
