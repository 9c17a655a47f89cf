"""Multistep and Verlet sweeper families + logging hooks."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.hooks.logging_hooks import (
    LogGlobalErrorPostStep,
    LogSDCIterations,
    LogSolution,
    LogStepSize,
    LogWork,
)
from pysdc_tpu.models.odes import Logistic
from pysdc_tpu.models.particles import HarmonicOscillator, OuterSolarSystem
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers import multistep as ms
from pysdc_tpu.sweepers.verlet import VerletSweeper
from pysdc_tpu.utils.stats import get_list_of_types, get_sorted

MS_ORDERS = {
    ms.AdamsBashforthExplicit1Step: 1,
    ms.BackwardEulerMultiStep: 1,
    ms.AdamsMoultonImplicit1Step: 2,
    ms.AdamsMoultonImplicit2Step: 3,
}


@pytest.mark.parametrize('cls', list(MS_ORDERS))
def test_multistep_orders(cls):
    errs = []
    dts = [0.1 / 2**i for i in range(3)]
    for dt in dts:
        desc = dict(
            problem_class=Logistic,
            problem_params=dict(u0=0.5, lam=2.0, newton_tol=1e-14),
            sweeper_class=cls,
            sweeper_params={},
            level_params=dict(dt=dt),
            step_params=dict(maxiter=1),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 1.0)
        errs.append(float(jnp.max(jnp.abs(uend - P.u_exact(1.0)))))
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(2) for i in range(len(errs) - 1)]
    assert np.median(orders) > MS_ORDERS[cls] - 0.35, (orders, errs)


def test_verlet_harmonic_oscillator_order():
    errs = []
    dts = [0.5, 0.25]
    for dt in dts:
        desc = dict(
            problem_class=HarmonicOscillator,
            problem_params=dict(k=1.0, mu=0.0),
            sweeper_class=VerletSweeper,
            sweeper_params=dict(num_nodes=3),
            level_params=dict(dt=dt, restol=1e-13),
            step_params=dict(maxiter=20),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_init, 0.0, 4.0)
        ex = P.u_exact(4.0)
        errs.append(max(float(jnp.max(jnp.abs(uend.pos - ex.pos))), float(jnp.max(jnp.abs(uend.vel - ex.vel)))))
    order = np.log(errs[0] / errs[1]) / np.log(2)
    # 3 Lobatto nodes: collocation order 2M-2 = 4
    assert order > 3.5, (order, errs)


def test_verlet_damped_oscillator():
    desc = dict(
        problem_class=HarmonicOscillator,
        problem_params=dict(k=1.0, mu=0.2),
        sweeper_class=VerletSweeper,
        sweeper_params=dict(num_nodes=4),
        level_params=dict(dt=0.2, restol=1e-13),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_init, 0.0, 2.0)
    ex = P.u_exact(2.0)
    # velocity-dependent forces see the pre-update velocity in eval_f (same
    # semantics as the reference verlet.py:124-126), leaving an O(dt^2) bias
    assert float(jnp.max(jnp.abs(uend.pos - ex.pos))) < 5e-3


def test_verlet_solar_system_energy_conservation():
    desc = dict(
        problem_class=OuterSolarSystem,
        problem_params={},
        sweeper_class=VerletSweeper,
        sweeper_params=dict(num_nodes=3),
        level_params=dict(dt=50.0, restol=1e-12),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    uend, _ = c.run(u0, 0.0, 1000.0)
    H0, H1 = float(P.eval_hamiltonian(u0)), float(P.eval_hamiltonian(uend))
    assert abs(H1 - H0) / abs(H0) < 1e-7


def test_logging_hooks_record_expected_types():
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
    from pysdc_tpu.models.heat import HeatND

    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-10),
        step_params=dict(maxiter=20),
    )
    hooks = [LogSolution, LogGlobalErrorPostStep, LogWork, LogSDCIterations, LogStepSize]
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': hooks}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.2)

    types = get_list_of_types(stats)
    for expected in ('u', 'e_global_post_step', 'e_global_rel_post_step', 'work_rhs', 'k', 'dt', 'niter'):
        assert expected in types, f'{expected} missing from {types}'

    errs = [v for _, v in get_sorted(stats, type='e_global_post_step')]
    assert all(e < 1e-4 for e in errs)
    us = get_sorted(stats, type='u')
    assert np.asarray(us[-1][1]).shape == (64,)
    works = [v for _, v in get_sorted(stats, type='work_rhs')]
    assert all(w > 0 for w in works)


@pytest.mark.parametrize('cls_name,expected_order', [('RKN4', 4), ('VelocityVerletRKN', 2)])
def test_rkn_harmonic_oscillator_order(cls_name, expected_order):
    from pysdc_tpu.sweepers import rkn

    cls = getattr(rkn, cls_name)
    errs = []
    for dt in (1 / 8, 1 / 16, 1 / 32):  # binary-exact so step counts divide Tend
        desc = dict(
            problem_class=HarmonicOscillator,
            problem_params=dict(k=1.0, mu=0.0),
            sweeper_class=cls,
            sweeper_params={},
            level_params=dict(dt=dt, restol=-1),
            step_params=dict(maxiter=1),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_init, 0.0, 2.0)
        ex = P.u_exact(2.0)
        errs.append(
            max(float(jnp.max(jnp.abs(uend.pos - ex.pos))), float(jnp.max(jnp.abs(uend.vel - ex.vel))))
        )
    orders = [np.log(errs[i] / errs[i + 1]) / np.log(2) for i in range(len(errs) - 1)]
    assert np.median(orders) > expected_order - 0.35, (orders, errs)


def test_rkn_damped_oscillator():
    """Weak velocity dependence (drag) is handled via the velocity tableau."""
    from pysdc_tpu.sweepers.rkn import RKN4

    desc = dict(
        problem_class=HarmonicOscillator,
        problem_params=dict(k=1.0, mu=0.2),
        sweeper_class=RKN4,
        sweeper_params={},
        level_params=dict(dt=1 / 16, restol=-1),
        step_params=dict(maxiter=1),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_init, 0.0, 2.0)
    ex = P.u_exact(2.0)
    assert float(jnp.max(jnp.abs(uend.pos - ex.pos))) < 1e-4


def test_generic_implicit_multi_component_system():
    """generic_implicit on a coupled multi-component state (leading component
    axis): the generic path handles any array-valued RHS, like the
    reference's generic sweeper over arbitrary mesh dtypes
    (generic_implicit.py:51-103)."""
    import scipy.linalg as sla

    from pysdc_tpu.core.problem import Problem
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    class TwoComponentDiffusionODE(Problem):
        A = np.array([[-1.0, 0.5], [0.25, -2.0]])

        def __init__(self, n=16):
            super().__init__(shape=(2, n))

        def eval_f(self, u, t):
            return jnp.tensordot(jnp.asarray(self.A), u, axes=(1, 0))

        def solve_system(self, rhs, factor, u0, t):
            M = jnp.linalg.inv(jnp.eye(2) - factor * jnp.asarray(self.A))
            return jnp.tensordot(M, rhs, axes=(1, 0))

        def u_exact(self, t, u_init=None, t_init=None):
            E = sla.expm(self.A * float(t))
            u0 = np.stack([np.linspace(1, 2, self.shape[1]), np.linspace(-1, 1, self.shape[1])])
            return jnp.asarray(E @ u0)

    desc = dict(
        problem_class=TwoComponentDiffusionODE,
        problem_params={},
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-12),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
    assert float(jnp.max(jnp.abs(uend - P.u_exact(0.5)))) < 1e-8
