"""Error estimators, Hot Rod fault detection, fault injection, inexactness
(mirrors the reference's Resilience-project test strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.convergence.adaptivity import Adaptivity
from pysdc_tpu.convergence.estimate_contraction_factor import EstimateContractionFactor
from pysdc_tpu.convergence.estimate_extrapolation_error import EstimateExtrapolationErrorNonMPI
from pysdc_tpu.convergence.estimate_polynomial_error import EstimatePolynomialError
from pysdc_tpu.convergence.hotrod import HotRod
from pysdc_tpu.convergence.inexactness import NewtonInexactness
from pysdc_tpu.convergence.interpolate_between_restarts import InterpolateBetweenRestarts
from pysdc_tpu.hooks.logging_hooks import LogLocalErrorPostStep
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.resilience.fault_injection import Fault, FaultInjector, flip_bit
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.utils.stats import get_sorted


def _heat_desc(ccontrollers, maxiter=5, dt=0.1, nvars=64):
    return dict(
        problem_class=HeatND,
        problem_params=dict(nvars=nvars, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=dt, restol=-1),
        step_params=dict(maxiter=maxiter),
        convergence_controllers=ccontrollers,
    )


def test_extrapolation_estimate_tracks_local_error():
    desc = _heat_desc({EstimateExtrapolationErrorNonMPI: {'no_storage': False}})
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': [LogLocalErrorPostStep]}, desc)
    P = c.MS[0].levels[0].prob

    estimates = []
    orig = EstimateExtrapolationErrorNonMPI.post_iteration_processing

    def patched(self, controller, S, **kw):
        orig(self, controller, S, **kw)
        est = S.levels[0].status.error_extrapolation_estimate
        if est is not None:
            estimates.append((float(S.time), est))

    EstimateExtrapolationErrorNonMPI.post_iteration_processing = patched
    try:
        _, stats = c.run(P.u_exact(0.0), 0.0, 1.0)
    finally:
        EstimateExtrapolationErrorNonMPI.post_iteration_processing = orig

    locals_ = dict(get_sorted(stats, type='e_local_post_step'))
    assert len(estimates) >= 3
    for t, est in estimates[1:]:
        e_loc = locals_[t + 0.1]
        assert est == pytest.approx(e_loc, rel=50), (t, est, e_loc)


def test_polynomial_error_estimate_order():
    """The left-out-node estimate converges at order ~M (here M=3)."""
    firsts = {}
    for dt in (0.2, 0.1):
        desc = _heat_desc({EstimatePolynomialError: {}}, maxiter=14, dt=dt)
        desc['level_params']['restol'] = 1e-11
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        _, stats = c.run(P.u_exact(0.0), 0.0, 0.4)
        est = [v for _, v in get_sorted(stats, type='error_embedded_estimate_post_step')]
        assert len(est) > 0
        firsts[dt] = est[0]
    order = np.log(firsts[0.2] / firsts[0.1]) / np.log(2)
    assert 2.0 < order < 4.5, (order, firsts)


def test_contraction_factor_estimated():
    desc = _heat_desc({EstimateContractionFactor: {'e_tol': 1e-10}})
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    rhos = []
    orig = EstimateContractionFactor.post_iteration_processing

    def patched(self, controller, S, **kw):
        orig(self, controller, S, **kw)
        rho = getattr(S.levels[0].status, 'contraction_factor', None)
        if rho is not None:
            rhos.append(rho)

    EstimateContractionFactor.post_iteration_processing = patched
    try:
        c.run(P.u_exact(0.0), 0.0, 0.3)
    finally:
        EstimateContractionFactor.post_iteration_processing = orig
    assert len(rhos) > 0
    assert np.median(rhos) < 0.5, 'SDC should contract fast on heat'


def test_flip_bit_involution():
    x = jnp.asarray(np.pi)
    for bit in (0, 1, 11, 30, 63):
        assert float(flip_bit(flip_bit(x, bit), bit)) == float(x)
    assert float(flip_bit(jnp.asarray(1.0), 0)) == -1.0


def test_hotrod_detects_injected_fault():
    """A bitflip in the final sweep must trip Hot Rod and be recovered."""
    injector = FaultInjector()
    # corrupt the LAST node late enough that the extrapolation history is
    # filled (needs n=4 previous steps) and early enough (iteration 3 <
    # estimate_iter=4) that the embedded estimate sees the corruption
    injector.add_fault(Fault(timestep=6, iteration=3, node=3, problem_pos=(10,), bit=10))

    desc = _heat_desc({HotRod: {'HotRod_tol': 1e-6}}, maxiter=5)
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    c.hooks.append(injector)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 1.0)

    assert injector.faults[0].happened
    err = float(jnp.max(jnp.abs(uend - P.u_exact(1.0))))
    assert err < 1e-3, err
    restarts = [v for _, v in get_sorted(stats, type='restart')]
    assert sum(restarts) >= 1, 'Hot Rod should have triggered a restart'

    # same fault without Hot Rod destroys the solution
    injector2 = FaultInjector()
    injector2.add_fault(Fault(timestep=6, iteration=5, node=3, problem_pos=(10,), bit=10))
    desc2 = _heat_desc({}, maxiter=5)
    c2 = ControllerNonMPI(1, {'logger_level': 40}, desc2)
    c2.hooks.append(injector2)
    uend2, _ = c2.run(P.u_exact(0.0), 0.0, 1.0)
    err2 = float(jnp.max(jnp.abs(uend2 - P.u_exact(1.0))))
    assert err2 > 1e3 * err, (err2, err)


def test_newton_inexactness_adjusts_tolerance():
    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=2.0, u0=(2.0, 0.0), newton_tol=1e-3),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-10),
        step_params=dict(maxiter=20),
        convergence_controllers={NewtonInexactness: {'ratio': 1e-2}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    tols = []
    orig = NewtonInexactness.set_tolerance

    def patched(self, lvl, tol):
        orig(self, lvl, tol)
        tols.append(tol)

    NewtonInexactness.set_tolerance = patched
    try:
        uend, _ = c.run(P.u_exact(0.0), 0.0, 0.2)
    finally:
        NewtonInexactness.set_tolerance = orig
    assert len(tols) > 3
    assert min(tols) < 1e-8, 'tolerance should tighten as SDC converges'
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.2))))
    assert err < 1e-7, err


def test_interpolate_between_restarts_runs():
    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-11),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.5, restol=-1),
        step_params=dict(maxiter=4),
        convergence_controllers={
            Adaptivity: {'e_tol': 1e-7},
            InterpolateBetweenRestarts: {},
        },
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.5)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.5))))
    # fixed-iteration SDC with local tolerance 1e-7 amplifies on Van der Pol;
    # the point here is that interpolated restarts run and stay accurate
    assert err < 2e-2, err
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert min(dts) < 0.5, 'adaptivity should have rejected the huge initial step'
