"""Runge-Kutta sweeper tests: empirical convergence orders pin every tableau
(mirrors reference tests/test_sweepers/test_Runge_Kutta_sweeper.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.dahlquist import Dahlquist, DahlquistIMEX
from pysdc_tpu.models.odes import Logistic
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers import runge_kutta as rk

EXPECTED_ORDER = {
    rk.ForwardEuler: 1,
    rk.BackwardEuler: 1,
    rk.CrankNicolson: 2,
    rk.ExplicitMidpointMethod: 2,
    rk.ImplicitMidpointMethod: 2,
    rk.RK4: 4,
    rk.Heun_Euler: 2,
    rk.Cash_Karp: 5,
    rk.CrouzeixDIRK4: 4,
    rk.ARK324L2SAESDIRK: 3,
    rk.ARK324L2SAERK: 3,
    rk.DIRK43_2: 3,
    rk.ESDIRK43: 4,
}

IMEX_ORDER = {
    rk.IMEXEuler: 1,
    rk.IMEXEulerStifflyAccurate: 1,
    rk.ARK32: 3,
}

EXPLICIT_METHODS = {rk.ForwardEuler, rk.ExplicitMidpointMethod, rk.RK4, rk.Heun_Euler, rk.Cash_Karp, rk.ARK324L2SAERK}


def _run(sweeper_class, problem_class, problem_params, dt, Tend):
    description = dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=sweeper_class,
        sweeper_params={},
        level_params=dict(dt=dt),
        step_params=dict(maxiter=1),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, description)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    return float(jnp.max(jnp.abs(uend - P.u_exact(Tend))))


def _empirical_order(sweeper_class, problem_class, problem_params, dts, Tend):
    errs = [_run(sweeper_class, problem_class, problem_params, dt, Tend) for dt in dts]
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(dts[i] / dts[i + 1]) for i in range(len(errs) - 1)]
    return np.median(orders), errs


@pytest.mark.parametrize('sweeper_class', list(EXPECTED_ORDER))
def test_rk_order_nonlinear(sweeper_class):
    """Order on the (nonlinear) logistic equation."""
    expected = EXPECTED_ORDER[sweeper_class]
    # DIRK43_2's error constant nearly cancels on the logistic problem at
    # dt=0.2 (non-monotone error); start finer for a clean asymptotic range
    dt0 = 0.05 if sweeper_class is rk.DIRK43_2 else 0.2
    dts = [dt0 / 2**i for i in range(4)]
    order, errs = _empirical_order(
        sweeper_class, Logistic, dict(u0=0.5, lam=2.0, newton_tol=1e-14), dts, 1.0
    )
    # one-sided: wrong coefficients lower the order; superconvergence on
    # scalar autonomous problems (collapsed order conditions) is acceptable
    assert order > expected - 0.35, f'{sweeper_class.__name__}: got order {order:.2f}, expected {expected} (errs={errs})'


@pytest.mark.parametrize('sweeper_class', list(IMEX_ORDER))
def test_rk_imex_order(sweeper_class):
    expected = IMEX_ORDER[sweeper_class]
    dts = [0.25 / 2**i for i in range(4)]
    lam_i = np.array([-1.0])
    lam_e = np.array([0.5])
    errs = []
    for dt in dts:
        errs.append(
            _run(sweeper_class, DahlquistIMEX, dict(lambdas_implicit=lam_i, lambdas_explicit=lam_e), dt, 1.0)
        )
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(dts[i] / dts[i + 1]) for i in range(len(errs) - 1)]
    order = np.median(orders)
    assert order > expected - 0.35, f'{sweeper_class.__name__}: got {order:.2f}, expected {expected} ({errs})'


@pytest.mark.parametrize('sweeper_class', [rk.Heun_Euler, rk.Cash_Karp, rk.ARK324L2SAESDIRK, rk.ESDIRK43])
def test_embedded_secondary_has_lower_order(sweeper_class):
    """The embedded update must converge at its own (lower) order."""
    from pysdc_tpu.core.level import Level

    errs = []
    dts = [0.2, 0.1, 0.05]
    for dt in dts:
        prob = Logistic(u0=0.5, lam=2.0, newton_tol=1e-14)
        sweep = sweeper_class({})
        lvl = Level(prob, sweep, dict(dt=dt))
        lvl.status.time = 0.0
        lvl.predict(prob.u_exact(0.0))
        lvl.update_nodes()
        lvl.compute_end_point()
        exact = prob.u_exact(dt)
        err2 = float(jnp.max(jnp.abs(lvl.uend_secondary - exact)))
        errs.append(err2)
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(dts[i] / dts[i + 1]) for i in range(len(errs) - 1)]
    # local error order = embedded global order + 1
    expected_local = {rk.Heun_Euler: 2, rk.Cash_Karp: 5, rk.ARK324L2SAESDIRK: 3, rk.ESDIRK43: 4}[sweeper_class]
    assert np.median(orders) > expected_local - 0.6, (orders, errs)


def test_stability_implicit_on_stiff_dahlquist():
    """L-stable methods must damp a very stiff lambda."""
    for cls in (rk.BackwardEuler, rk.ARK324L2SAESDIRK, rk.ESDIRK43, rk.DIRK43_2):
        err = _run(cls, Dahlquist, dict(lambdas=np.array([-1e6]), u0=1.0), 0.1, 1.0)
        assert err < 1e-3, f'{cls.__name__} unstable on stiff problem: {err}'


def test_rk_overrides_restol():
    from pysdc_tpu.core.level import Level

    prob = Logistic()
    lvl = Level(prob, rk.RK4({}), dict(dt=0.1, restol=1e-10))
    assert lvl.params.restol == -1.0


def test_tableau_validation():
    with pytest.raises(Exception):
        rk.ButcherTableau(np.array([1.0]), np.array([0.0]), np.array([[0.0, 1.0], [0.0, 0.0]]))
    with pytest.raises(Exception):
        # upper triangular entries are not allowed
        rk.ButcherTableau(np.array([0.5, 0.5]), np.array([0.0, 1.0]), np.array([[0.0, 0.5], [0.5, 0.0]]))
