"""Diagonal-basis multi-sweep fast path (ops/diag_sdc.py) must match looping
GenericImplicit.update_nodes to float64 roundoff, for every preconditioner
shape (diagonal / lower-triangular / k-dependent), operator basis (rfft,
complex-symbol fft, Dirichlet eigenbasis), and with FAS tau."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.core.state import LevelState
from pysdc_tpu.models.advection import AdvectionND
from pysdc_tpu.models.heat import HeatND, HeatNDForced
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit


def _loop_reference(sweep, prob, state, t, dt, k, k0=0):
    for i in range(k0, k0 + k):
        state = sweep.update_nodes(prob, state, t, dt, i)
    return state


def _assert_states_close(a, b, tol=1e-12):
    scale = max(1.0, float(jnp.max(jnp.abs(b.u))))
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u), rtol=0, atol=tol * scale)
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f), rtol=0, atol=100 * tol * scale)


@pytest.mark.parametrize('qi', ['LU', 'IE', 'IEpar', 'MIN-SR-S'])
def test_heat_periodic_matches_generic(qi):
    prob = HeatND(nvars=(32, 32), nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 4, 'quad_type': 'RADAU-RIGHT', 'QI': qi})
    dt = jnp.asarray(0.05)
    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    fast = sweep.update_nodes_k(prob, state, 0.0, dt, 6)
    slow = _loop_reference(sweep, prob, state, 0.0, dt, 6)
    _assert_states_close(fast, slow)


def test_k_dependent_min_sr_flex():
    prob = HeatND(nvars=64, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'MIN-SR-FLEX'})
    dt = jnp.asarray(0.02)
    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    fast = sweep.update_nodes_k(prob, state, 0.0, dt, 4, k0=1)
    slow = _loop_reference(sweep, prob, state, 0.0, dt, 4, k0=1)
    _assert_states_close(fast, slow)


def test_advection_complex_symbol():
    prob = AdvectionND(nvars=64, c=1.0, freq=2, order=4, stencil_type='center')
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'LU'})
    dt = jnp.asarray(0.01)
    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    fast = sweep.update_nodes_k(prob, state, 0.0, dt, 5)
    slow = _loop_reference(sweep, prob, state, 0.0, dt, 5)
    _assert_states_close(fast, slow)


def test_dirichlet_eigenbasis():
    prob = HeatND(nvars=31, nu=0.1, freq=2, bc='dirichlet-zero')
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'LOBATTO', 'QI': 'LU'})
    dt = jnp.asarray(0.05)
    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    fast = sweep.update_nodes_k(prob, state, 0.0, dt, 4)
    slow = _loop_reference(sweep, prob, state, 0.0, dt, 4)
    _assert_states_close(fast, slow)


def test_with_fas_tau():
    prob = HeatND(nvars=32, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'LU'})
    dt = jnp.asarray(0.05)
    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    rng = np.random.default_rng(0)
    tau = jnp.asarray(1e-3 * rng.standard_normal(state.tau.shape))
    state = LevelState(u=state.u, f=state.f, tau=tau)
    fast = sweep.update_nodes_k(prob, state, 0.0, dt, 3)
    slow = _loop_reference(sweep, prob, state, 0.0, dt, 3)
    _assert_states_close(fast, slow)


def test_forced_problem_falls_back():
    prob = HeatNDForced(nvars=32, nu=0.1, freq=2, bc='periodic')
    assert prob.diagonalizable_operator is None


def test_iterative_solver_falls_back():
    prob = HeatND(nvars=32, nu=0.1, freq=2, bc='periodic', solver_type='CG')
    assert prob.diagonalizable_operator is None


def test_convergence_to_collocation_solution():
    # many fused sweeps must converge to the collocation fixed point:
    # residual of the final state ~ 0
    prob = HeatND(nvars=(32, 32), nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 4, 'quad_type': 'RADAU-RIGHT', 'QI': 'LU'})
    dt = jnp.asarray(0.1)
    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    state = sweep.update_nodes_k(prob, state, 0.0, dt, 40)
    _, res = sweep.compute_residual(state, dt)
    assert float(res) < 1e-13, float(res)
