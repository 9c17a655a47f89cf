"""Boris-SDC/Penning trap, power electronics + switch estimator, DAE sweepers."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.convergence.switch_estimator import SwitchEstimator
from pysdc_tpu.models.dae_problems import Pendulum2D, SimpleDAE
from pysdc_tpu.models.particles import PenningTrap3D
from pysdc_tpu.models.power_electronics import Battery, BuckConverter, Piline
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.boris import BorisSDC
from pysdc_tpu.sweepers.dae import FullyImplicitDAE, SemiImplicitDAE
from pysdc_tpu.sweepers.imex import IMEXSweeper


def test_boris_penning_trap_order():
    """Boris-SDC with 3 Lobatto nodes converges at order ~4 on the
    single-particle Penning trap vs the analytic trajectory."""
    errs = []
    dts = [0.015625, 0.0078125]
    for dt in dts:
        desc = dict(
            problem_class=PenningTrap3D,
            problem_params=dict(omega_B=25.0, omega_E=4.9, nparts=1, sig=0.1),
            sweeper_class=BorisSDC,
            sweeper_params=dict(num_nodes=3, quad_type='LOBATTO'),
            level_params=dict(dt=dt, restol=1e-12),
            step_params=dict(maxiter=20),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
        ex = P.u_exact(0.5)
        errs.append(max(float(jnp.max(jnp.abs(uend.pos - ex.pos))), float(jnp.max(jnp.abs(uend.vel - ex.vel)))))
    order = np.log(errs[0] / errs[1]) / np.log(2)
    assert order > 3.3, (order, errs)


def test_battery_switch_estimator_finds_event():
    """The switch estimator must locate t* = ln(alpha) = RC ln(1.2) within
    its tolerance and count exactly one switch."""
    desc = dict(
        problem_class=Battery,
        problem_params={},
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=4, QI='LU'),
        level_params=dict(dt=0.01, restol=1e-12),
        step_params=dict(maxiter=10),
        convergence_controllers={SwitchEstimator: {}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
    assert P.nswitches == 1
    assert abs(P.t_switch - np.log(1.2)) < 1e-4
    # after the switch vC stays pinned near V_ref, iL rises towards Vs/(Rs+R)
    assert abs(float(uend[1]) - 1.0) < 5e-3
    assert float(uend[0]) > 1.0


def test_piline_relaxes_to_steady_state():
    desc = dict(
        problem_class=Piline,
        problem_params={},
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.25, restol=1e-11),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 20.0)
    # analytic steady state of the pi-line circuit
    i_inf = P.Vs / (P.Rs + P.Rpi + P.Rl)
    expect = np.array([P.Vs - P.Rs * i_inf, P.Rl * i_inf, i_inf])
    assert np.allclose(np.asarray(uend), expect, atol=0.5), (uend, expect)


def test_buck_converter_steps_down_voltage():
    desc = dict(
        problem_class=BuckConverter,
        problem_params=dict(duty=0.5, fsw=1e3),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=2e-5, restol=1e-11),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.01)
    v2 = float(uend[1])
    assert np.isfinite(np.asarray(uend)).all()
    # output voltage between zero and the (stepped-down) source level
    assert 0.0 < v2 < P.Vs, v2


@pytest.mark.parametrize('sweeper_class', [FullyImplicitDAE, SemiImplicitDAE])
def test_simple_dae_accuracy(sweeper_class):
    desc = dict(
        problem_class=SimpleDAE,
        problem_params=dict(newton_tol=1e-12),
        sweeper_class=sweeper_class,
        sweeper_params=dict(num_nodes=3, QI='IE'),
        level_params=dict(dt=0.05, restol=1e-11),
        step_params=dict(maxiter=40),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 1.0)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(1.0)))) < 5e-7


def test_pendulum_constraint_preserved():
    desc = dict(
        problem_class=Pendulum2D,
        problem_params=dict(newton_tol=1e-12),
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=3, QI='IE'),
        level_params=dict(dt=0.01, restol=1e-10),
        step_params=dict(maxiter=50),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 1.0)
    assert abs(float(uend[0] ** 2 + uend[1] ** 2) - 1.0) < 1e-10


def test_dae_gauss_quadrature_rejected():
    from pysdc_tpu.core.errors import ParameterError

    with pytest.raises(ParameterError):
        FullyImplicitDAE({'num_nodes': 3, 'quad_type': 'LOBATTO'})


def test_discontinuous_ode_with_switch_estimator():
    from pysdc_tpu.models.odes import DiscontinuousTestODE
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=DiscontinuousTestODE,
        problem_params={},
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='IE'),
        level_params=dict(dt=0.05, restol=1e-12),
        step_params=dict(maxiter=10),
        convergence_controllers={SwitchEstimator: {}},
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 2.0)
    assert P.nswitches == 1
    assert abs(P.t_switch - np.log(5.0)) < 5e-4
    assert abs(float(uend[0]) - float(P.u_exact(2.0)[0])) < 5e-2


def test_fisher_traveling_wave():
    from pysdc_tpu.models.fisher import GeneralizedFisher1D
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=GeneralizedFisher1D,
        problem_params=dict(nvars=255, nu=1.0, lambda0=2.0),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.01, restol=1e-11),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.1)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(0.1)))) < 5e-6


def test_prothero_robinson_stiff_accuracy():
    from pysdc_tpu.models.odes import ProtheroRobinson
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=ProtheroRobinson,
        problem_params=dict(epsilon=1e-3),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.1, restol=1e-12),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 1.0)
    assert float(abs(uend[0] - P.u_exact(1.0)[0])) < 1e-7


def test_dae_problematic_f():
    from pysdc_tpu.models.dae_problems import ProblematicF

    desc = dict(
        problem_class=ProblematicF,
        problem_params=dict(eta=1.0),
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=3),
        level_params=dict(dt=0.05, restol=1e-11),
        step_params=dict(maxiter=40),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 1.0)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(1.0)))) < 1e-5


def test_dae_discontinuous_pre_event_accuracy():
    """Before the event, (y, z) = (cosh, sinh) is reproduced to high accuracy
    (needs the relative end-of-interval guard: 40 steps of dt rounding)."""
    from pysdc_tpu.models.dae_problems import DiscontinuousTestDAE

    desc = dict(
        problem_class=DiscontinuousTestDAE,
        problem_params={},
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=3),
        level_params=dict(dt=0.05, restol=1e-10),
        step_params=dict(maxiter=40),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(1.0), 1.0, 3.0)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(3.0)))) < 1e-7


def test_dae_discontinuous_contact_detection_shrinks_to_event():
    """The sliding-mode contact path: restarts shrink the step so its
    boundary lands close to the event t* = arccosh(50) (the frozen branch
    prevents a sign change, so exact declaration is not asserted here —
    see SwitchEstimator contact_tol docs)."""
    from pysdc_tpu.convergence.basic_restarting import BasicRestarting
    from pysdc_tpu.models.dae_problems import DiscontinuousTestDAE
    from pysdc_tpu.utils.stats import get_sorted

    desc = dict(
        problem_class=DiscontinuousTestDAE,
        problem_params=dict(newton_tol=1e-6),
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=4, QI='LU'),
        level_params=dict(dt=0.02, restol=1e-11),
        step_params=dict(maxiter=20),
        convergence_controllers={
            SwitchEstimator: {'tol': 1e-6, 'alpha': 0.97, 'contact_tol': 0.5},
            BasicRestarting: {'max_restarts': 20, 'crash_after_max_restarts': False},
        },
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(4.6), 4.6, 4.62)
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    # the first accepted step must have been shrunk toward the event
    assert dts[0] < 0.01, dts
    assert abs(4.6 + dts[0] - P.t_switch_exact) < 2e-3
    assert float(jnp.max(jnp.abs(uend - P.u_exact(4.62)))) < 0.05


def test_dae_transistor_amplifiers_self_convergence():
    from pysdc_tpu.models.dae_problems import OneTransistorAmplifier, TwoTransistorAmplifier

    for cls in (OneTransistorAmplifier, TwoTransistorAmplifier):
        sols = {}
        for dt in (1e-4, 5e-5):
            desc = dict(
                problem_class=cls,
                problem_params=dict(newton_tol=1e-10),
                sweeper_class=FullyImplicitDAE,
                sweeper_params=dict(num_nodes=3),
                level_params=dict(dt=dt, restol=1e-9),
                step_params=dict(maxiter=40),
            )
            c = ControllerNonMPI(1, {'logger_level': 40}, desc)
            P = c.MS[0].levels[0].prob
            uend, _ = c.run(P.u_exact(0.0), 0.0, 2e-3)
            sols[dt] = np.asarray(uend)
        assert np.isfinite(sols[1e-4]).all()
        assert np.abs(sols[1e-4] - sols[5e-5]).max() < 1e-4, cls.__name__


def test_dae_synchronous_machine():
    """Steady state persists; a torque drop at t=0.05 decelerates the rotor."""
    from pysdc_tpu.models.dae_problems import SynchronousMachineInfiniteBus

    desc = dict(
        problem_class=SynchronousMachineInfiniteBus,
        problem_params=dict(newton_tol=1e-11),
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=3),
        level_params=dict(dt=1 / 1024, restol=1e-10),
        step_params=dict(maxiter=40),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 16 / 1024)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(0.0)))) < 1e-6  # steady state

    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    uend, _ = c.run(P.u_exact(0.0), 0.0, 96 / 1024)  # through t = 0.05
    assert float(uend[7]) < 1.0 - 1e-3  # rotor decelerates after torque drop
    assert bool(jnp.isfinite(uend).all())


# -- Runge-Kutta DAE sweepers (reference projects/DAE/sweepers/rungeKuttaDAE.py,
# order table from projects/DAE/tests/test_RungeKuttaDAE.py:98-101) ---------
RK_DAE_ORDER = None


def _rk_dae_err(sweeper_class, dt, t0=1.0, Tend=1.8):
    """March the index-1 DiscontinuousTestDAE well before its event —
    the reference's order-gate setting (test_RungeKuttaDAE.py:89-101)."""
    from pysdc_tpu.models.dae_problems import DiscontinuousTestDAE

    desc = dict(
        problem_class=DiscontinuousTestDAE,
        problem_params=dict(newton_tol=1e-13),
        sweeper_class=sweeper_class,
        sweeper_params={},
        level_params=dict(dt=dt),
        step_params=dict(maxiter=1),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(t0), t0, Tend)
    return float(jnp.max(jnp.abs(uend - P.u_exact(Tend))))


@pytest.mark.parametrize('name,expected', [
    ('BackwardEulerDAE', 1), ('TrapezoidalRuleDAE', 2), ('DIRK43_2DAE', 3), ('EDIRK4DAE', 4),
])
def test_rk_dae_orders(name, expected):
    """Classical orders of the RK-DAE family on the index-1
    DiscontinuousTestDAE (reference test_RungeKuttaDAE.py:98-101)."""
    import pysdc_tpu.sweepers.dae as dae_mod

    cls = getattr(dae_mod, name)
    dts = [0.1, 0.05, 0.025]
    errs = [_rk_dae_err(cls, dt) for dt in dts]
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(2) for i in range(len(errs) - 1)]
    order = float(np.median(orders))
    assert order > expected - 0.4, (order, errs)


def test_rk_dae_carries_du_between_steps():
    """du_init must be updated from the previous step's last stage
    (reference rungeKuttaDAE.py:164): a multi-step march stays accurate."""
    import pysdc_tpu.sweepers.dae as dae_mod

    err = _rk_dae_err(dae_mod.TrapezoidalRuleDAE, 0.05)
    assert err < 5e-3, err
