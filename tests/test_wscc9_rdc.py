"""WSCC 9-bus power system DAE (reference projects/DAE/problems/
wscc9BusSystem.py) and RDC collocation (reference projects/RDC/
equidistant_RDC.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.dahlquist import Dahlquist
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.models.wscc9 import WSCC9BusSystem
from pysdc_tpu.ops.collocation import _rdc_collocation, get_collocation
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.dae import FullyImplicitDAE
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit


# ---------------------------- WSCC 9-bus -------------------------------

def test_wscc9_initial_condition_consistency():
    P = WSCC9BusSystem()
    u0 = P.u_exact(0.0)
    assert u0.shape == (57,)
    # machine speeds start at synchronous speed, voltages at the power flow
    m, n = P.m, P.n
    assert np.allclose(np.asarray(u0[5 * m:6 * m]), P.ws)
    assert np.allclose(np.asarray(u0[13 * m:13 * m + n]), P.V0)
    # pre-event steady state: residual with du=0 matches the reference's own
    # (imperfect) power-flow data to ~1e-2, and the differential block is
    # orders tighter
    f0 = np.asarray(P.eval_f(u0, jnp.zeros(57), 0.0))
    assert np.max(np.abs(f0)) < 2e-2
    assert np.max(np.abs(f0[:33])) < 2e-2


def test_wscc9_line_outage_changes_network():
    P = WSCC9BusSystem()
    u0 = P.u_exact(0.0)
    f_pre = np.asarray(P.eval_f(u0, jnp.zeros(57), 0.0))
    f_post = np.asarray(P.eval_f(u0, jnp.zeros(57), 0.06))
    # the outage only perturbs the network (algebraic) equations
    assert np.max(np.abs(f_post[33:] - f_pre[33:])) > 0.1
    assert np.max(np.abs(f_post[:33] - f_pre[:33])) < 1e-12


def test_wscc9_psv_limiter():
    P = WSCC9BusSystem()
    u0 = np.asarray(P.u_exact(0.0)).copy()
    du = 0.1 * np.ones(57)
    idx = 10 * P.m  # PSV of machine 1
    u0[idx] = 1.5  # beyond psv_max
    f = np.asarray(P.eval_f(jnp.asarray(u0), jnp.asarray(du), 0.0))
    # residual row for machine-1 PSV becomes dPSV[0] (valve pinned);
    # residual rows 9m..10m are the PSV equations (reference eqs ordering)
    assert abs(f[9 * P.m] - du[idx]) < 1e-12


def test_wscc9_short_integration():
    desc = dict(
        problem_class=WSCC9BusSystem,
        problem_params=dict(newton_tol=1e-9),
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=2, QI='IE'),
        level_params=dict(dt=0.01, restol=5e-9),
        step_params=dict(maxiter=40),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    uend, stats = c.run(u0, 0.0, 0.03)
    uend = np.asarray(uend)
    assert np.all(np.isfinite(uend))
    m, n = P.m, P.n
    # pre-event: machine speeds stay near synchronous, voltages near power flow
    w = uend[5 * m:6 * m]
    assert np.max(np.abs(w / P.ws - 1.0)) < 1e-3
    V = uend[13 * m:13 * m + n]
    assert np.max(np.abs(V - P.V0)) < 0.05


def test_wscc9_switching_info():
    P = WSCC9BusSystem()
    u_lo = np.zeros(57)
    u_hi = np.zeros(57)
    idx = 10 * P.m
    u_lo[idx], u_hi[idx] = 0.9, 1.1
    detected, m_guess, h = P.get_switching_info([u_lo, u_lo, u_hi], 0.0)
    assert detected and m_guess == 1
    assert h[0] < 0 <= h[2]
    P.count_switches()
    assert P.nswitches == 1


# ------------------------------- RDC -----------------------------------

def test_rdc_polynomial_limit_matches_equid_lobatto():
    for M in (3, 5, 7):
        poly = get_collocation(M, 'EQUID', 'LOBATTO')
        rdc = _rdc_collocation(M, 0.0, 1.0, d=M - 1)
        assert np.allclose(poly.Qmat, rdc.Qmat, atol=1e-12)
        assert np.allclose(poly.weights, rdc.weights, atol=1e-12)


def test_rdc_quadrature_exactness_high_M():
    # blended rational interpolation stays stable at M=20 where polynomial
    # equidistant interpolation would blow up (Runge)
    c = get_collocation(20, 'EQUID-RDC', 'LOBATTO')
    for d in range(6):
        approx = float(np.dot(c.weights, c.nodes**d))
        assert abs(approx - 1.0 / (d + 1)) < 1e-12
    # no Runge blow-up: degree-19 Newton-Cotes weights reach O(10^3); the
    # blended rational weights stay O(1)
    assert np.max(np.abs(c.weights)) < 10.0
    assert np.allclose(c.Qmat[-1, 1:], c.weights)


def test_rdc_sweeper_converges_dahlquist():
    desc = dict(
        problem_class=Dahlquist,
        problem_params=dict(lambdas=[-1.0]),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=8, node_type='EQUID-RDC', quad_type='LOBATTO', QI='IE'),
        level_params=dict(dt=0.5, restol=1e-12),
        step_params=dict(maxiter=60),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 1.0)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(1.0))))
    assert err < 1e-10, err


def test_rdc_vanderpol():
    # the reference RDC project's workhorse problem (projects/RDC/
    # vanderpol_error_test.py): high-node RDC on Van der Pol
    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=2.0, newton_tol=1e-12),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=10, node_type='EQUID-RDC', quad_type='LOBATTO', QI='IE'),
        level_params=dict(dt=0.1, restol=1e-11),
        step_params=dict(maxiter=60),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.3)
    ref = P.generate_scipy_reference_solution(
        lambda t, u: np.asarray(P.eval_f(jnp.asarray(u), t)), 0.3, P.u_exact(0.0), 0.0
    )
    assert float(jnp.max(jnp.abs(uend - ref))) < 1e-8
