"""Brusselator, n-capacitor battery, Henon-Heiles, full solar system,
AdaptivityPolynomialError, iteration estimator."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.convergence.adaptivity import AdaptivityPolynomialError
from pysdc_tpu.convergence.check_iteration_estimator import CheckIterationEstimatorNonMPI
from pysdc_tpu.convergence.switch_estimator import SwitchEstimator
from pysdc_tpu.hooks.logging_hooks import LogGlobalErrorPostStep
from pysdc_tpu.models.brusselator import Brusselator
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.models.particles import FullSolarSystem, HenonHeiles
from pysdc_tpu.models.power_electronics import BatteryNCapacitors
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.sweepers.verlet import VerletSweeper
from pysdc_tpu.utils.stats import get_sorted


def test_brusselator_stable_oscillation():
    desc = dict(
        problem_class=Brusselator,
        problem_params=dict(nvars=(64, 64)),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-9),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
    assert bool(jnp.isfinite(uend).all())
    assert 0.0 < float(uend[0].min()) and float(uend[0].max()) < 20.0


def test_battery_n_capacitors_two_switches():
    desc = dict(
        problem_class=BatteryNCapacitors,
        problem_params=dict(ncapacitors=2),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=4, QI='LU'),
        level_params=dict(dt=0.01, restol=1e-12),
        step_params=dict(maxiter=10),
        convergence_controllers={SwitchEstimator: {}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.6)
    assert P.nswitches == 2
    # both capacitors drained to their reference values
    assert np.allclose(np.asarray(uend[1:]), 1.0, atol=5e-3)


def test_henon_heiles_energy_conservation():
    desc = dict(
        problem_class=HenonHeiles,
        problem_params={},
        sweeper_class=VerletSweeper,
        sweeper_params=dict(num_nodes=3),
        level_params=dict(dt=0.1, restol=1e-12),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_init
    uend, _ = c.run(u0, 0.0, 10.0)
    H0, H1 = float(P.eval_hamiltonian(u0)), float(P.eval_hamiltonian(uend))
    assert abs(H1 - H0) / abs(H0) < 1e-6


def test_full_solar_system_energy_conservation():
    desc = dict(
        problem_class=FullSolarSystem,
        problem_params={},
        sweeper_class=VerletSweeper,
        sweeper_params=dict(num_nodes=3),
        level_params=dict(dt=10.0, restol=1e-11),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    uend, _ = c.run(u0, 0.0, 500.0)
    H0, H1 = float(P.eval_hamiltonian(u0)), float(P.eval_hamiltonian(uend))
    assert abs(H1 - H0) / abs(H0) < 1e-4


def test_adaptivity_polynomial_error_controls_error():
    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-9),
        step_params=dict(maxiter=30),
        convergence_controllers={AdaptivityPolynomialError: {'e_tol': 1e-7}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': [LogGlobalErrorPostStep]}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 1.0)
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    assert len(set(np.round(dts, 12))) > 3, 'step size never adapted'
    # per-step global error (vs exact at the step's own end time) stays tiny;
    # note the run may overshoot Tend slightly when dt_initial exceeds the
    # remaining interval — same semantics as the reference SpreadStepSizes
    errs = [v for _, v in get_sorted(stats, type='e_global_post_step', recomputed=False)]
    assert errs[-1] < 1e-8, errs[-1]


def test_iteration_estimator_stops_early():
    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=-1),
        step_params=dict(maxiter=50),
        convergence_controllers={CheckIterationEstimatorNonMPI: {'errtol': 1e-8}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.2)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    assert all(i < 10 for i in iters), iters
    assert float(jnp.max(jnp.abs(uend - P.u_exact(0.2)))) < 1e-6


def test_acoustic_advection_imex():
    """Fast-wave-slow-wave acoustic advection vs d'Alembert exact solution."""
    from pysdc_tpu.models.acoustic import AcousticAdvection1D

    desc = dict(
        problem_class=AcousticAdvection1D,
        problem_params=dict(nvars=512, cs=1.0, cadv=0.1, waveno=5),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=1 / 256, restol=1e-11),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 50 / 256)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(50 / 256))))
    assert err < 5e-5, err
