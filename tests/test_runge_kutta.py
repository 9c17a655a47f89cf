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


# ---------------------------------------------------------------------------
# New tableaus: algebraic order-condition gates + convergence orders
# ---------------------------------------------------------------------------


def _order_condition_residual(A, b, c, order):
    """Max residual of all Butcher order conditions up to `order` (<=5)."""
    Ac = A @ c
    conds = [b.sum() - 1]
    if order >= 2:
        conds += [b @ c - 1 / 2]
    if order >= 3:
        conds += [b @ c**2 - 1 / 3, b @ Ac - 1 / 6]
    if order >= 4:
        conds += [b @ c**3 - 1 / 4, (b * c) @ Ac - 1 / 8, b @ A @ c**2 - 1 / 12, b @ A @ Ac - 1 / 24]
    if order >= 5:
        conds += [
            b @ c**4 - 1 / 5,
            (b * c**2) @ Ac - 1 / 10,
            b @ (Ac * Ac) - 1 / 20,
            (b * c) @ A @ c**2 - 1 / 15,
            b @ A @ c**3 - 1 / 20,
            (b * c) @ A @ Ac - 1 / 30,
            b @ A @ (c * Ac) - 1 / 40,
            b @ A @ A @ c**2 - 1 / 60,
            b @ A @ A @ Ac - 1 / 120,
        ]
    return float(np.max(np.abs(conds)))


TABLEAU_ORDERS = {
    rk.EDIRK4: 4,
    rk.DIRK43: 4,
    rk.ESDIRK53: 5,
    rk.ARK548L2SAERK: 5,
    rk.ARK548L2SAESDIRK: 5,
    rk.ARK548L2SAESDIRK2: 5,
    rk.ARK548L2SAERK2: 5,
}


@pytest.mark.parametrize('cls', list(TABLEAU_ORDERS))
def test_order_conditions_exact(cls):
    """Every coefficient is pinned: all scalar order conditions to 1e-11."""
    A = np.asarray(cls.matrix, float)
    c = np.asarray(cls.nodes, float)
    w = np.asarray(cls.weights, float)
    b = w[0] if w.ndim == 2 else w
    assert np.max(np.abs(A.sum(1) - c)) < 1e-11, 'row sums must equal nodes'
    assert _order_condition_residual(A, b, c, TABLEAU_ORDERS[cls]) < 1e-11
    if w.ndim == 2:
        emb_order = TABLEAU_ORDERS[cls] - (2 if cls is rk.ESDIRK53 else 1)
        assert _order_condition_residual(A, w[1], c, emb_order) < 1e-11
        # genuinely lower order: next-order conditions must NOT all hold
        assert _order_condition_residual(A, w[1], c, emb_order + 1) > 1e-4


def test_ark_additive_coupling_conditions():
    """The ARK pairs satisfy ALL two-color (additive) order conditions up to
    their order — mixed implicit/explicit trees included.  This is the
    property that makes the IMEX combination order 5 / order 2-3, not just
    each part separately (Kennedy & Carpenter 2003 sec. 3)."""
    import itertools

    def trees_of_order(n, cache={1: [()]}):
        if n in cache:
            return cache[n]
        from collections import Counter

        out = set()

        def parts(total, maxpart):
            if total == 0:
                yield ()
                return
            for p in range(min(total, maxpart), 0, -1):
                for rest in parts(total - p, p):
                    yield (p,) + rest

        for part in parts(n - 1, n - 1):
            cnt = Counter(part)
            choices = []
            for order, k in sorted(cnt.items()):
                subs = trees_of_order(order)
                choices.append(list(itertools.combinations_with_replacement(subs, k)))
            for combo in itertools.product(*choices):
                out.add(tuple(sorted(sum(combo, ()), key=repr)))
        cache[n] = sorted(out, key=repr)
        return cache[n]

    def order_of(tree):
        return 1 + sum(order_of(t) for t in tree)

    def density(tree):
        g = order_of(tree)
        for t in tree:
            g *= density(t)
        return g

    def n_edges(tree):
        return sum(1 + n_edges(t) for t in tree)

    def phi(tree, colors, idx, mats, e):
        out = e.copy()
        for sub in tree:
            col = colors[idx[0]]
            idx[0] += 1
            out = out * (mats[col] @ phi(sub, colors, idx, mats, e))
        return out

    def max_coupling_residual(AI, AE, b, max_order):
        s = len(b)
        e = np.ones(s)
        worst = 0.0
        for n in range(1, max_order + 1):
            for tree in trees_of_order(n):
                for colors in itertools.product((0, 1), repeat=n_edges(tree)):
                    v = phi(tree, list(colors), [0], (AI, AE), e)
                    worst = max(worst, abs(b @ v - 1.0 / density(tree)))
        return worst

    for pair, order in ((rk.ARK54, 5), (rk.ARK548L2SA, 5), (rk.ARK32, 3), (rk.ARK2, 2), (rk.ARK3, 3)):
        AI = np.asarray(pair.matrix, float)
        AE = np.asarray(pair.matrix_explicit, float)
        w = np.asarray(pair.weights, float)
        b = w[0] if w.ndim == 2 else w
        res = max_coupling_residual(AI, AE, b, order)
        assert res < 1e-11, f'{pair.__name__}: coupling residual {res}'
        if w.ndim == 2:
            res_emb = max_coupling_residual(AI, AE, w[1], order - 1)
            assert res_emb < 1e-11, f'{pair.__name__} embedded: {res_emb}'
        if pair in (rk.ARK2, rk.ARK3):
            # both parts globally stiffly accurate (usable on DAEs)
            be = np.asarray(pair.weights_explicit, float)
            assert np.allclose(AI[-1], b) and np.allclose(AE[-1], be)


@pytest.mark.parametrize(
    'cls,expected',
    [(rk.EDIRK4, 4), (rk.DIRK43, 4), (rk.ESDIRK53, 5), (rk.ARK548L2SAESDIRK, 5), (rk.ARK548L2SAERK2, 5)],
)
def test_new_rk_order_nonlinear(cls, expected):
    dts = [0.2 / 2**i for i in range(4)]
    order, errs = _empirical_order(cls, Logistic, dict(u0=0.5, lam=2.0, newton_tol=1e-14), dts, 1.0)
    assert order > expected - 0.35, f'{cls.__name__}: got order {order:.2f} (errs={errs})'


@pytest.mark.parametrize('cls,expected', [(rk.ARK54, 5), (rk.ARK548L2SA, 5), (rk.ARK2, 2), (rk.ARK3, 3)])
def test_new_imex_order(cls, expected):
    dts = [0.25 / 2**i for i in range(4)]
    errs = [
        _run(cls, DahlquistIMEX, dict(lambdas_implicit=np.array([-1.0]), lambdas_explicit=np.array([0.5])), dt, 1.0)
        for dt in dts
    ]
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(dts[i] / dts[i + 1]) for i in range(len(errs) - 1)]
    order = np.median(orders)
    assert order > expected - 0.35, f'{cls.__name__}: got {order:.2f} ({errs})'


def test_esdirk53_l_stability():
    """Main and embedded methods of the re-derived ESDIRK53 are L-stable."""
    A = np.asarray(rk.ESDIRK53.matrix, float)
    for wvec in np.asarray(rk.ESDIRK53.weights, float):
        Ah, ah = A[1:, 1:], A[1:, 0]
        w = np.linalg.solve(Ah.T, wvec[1:])
        assert abs(wvec[0] - w @ ah) < 1e-10, 'R(z) must stay bounded as z -> -inf'
        assert abs(1.0 - w.sum()) < 1e-10, 'R(-inf) must vanish'
    for cls in (rk.ESDIRK53, rk.DIRK43, rk.ARK548L2SAESDIRK, rk.ARK548L2SAESDIRK2):
        err = _run(cls, Dahlquist, dict(lambdas=np.array([-1e6]), u0=1.0), 0.1, 1.0)
        assert err < 1e-3, f'{cls.__name__} unstable on stiff problem: {err}'
    # EDIRK4 is stiffly accurate but only A-stable (not L-stable): damped,
    # just more slowly
    err = _run(rk.EDIRK4, Dahlquist, dict(lambdas=np.array([-1e6]), u0=1.0), 0.1, 1.0)
    assert err < 0.1
