"""Step 18: DAE campaign — convergence orders, sweeper comparison, machines.

The study shape of the reference's ``DAE`` project
(``run/run_convergence_test.py``, ``run/run_iteration_test.py``,
``run/synchronous_machine_playground.py``): measure the SDC convergence
order on an index-2 DAE *separately* for the differential and algebraic
variables (they differ — the algebraic components converge at the reduced
collocation order), compare the fully-implicit and semi-implicit sweepers,
hold an index-3 constraint over a long pendulum swing, and march the
synchronous-machine-vs-infinite-bus model through a load step.

On TPU every DAE node solve is one traced Newton on the flattened system
(jacfwd + lax.while_loop), so the entire campaign runs as a handful of
compiled programs.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, get_sorted
from pysdc_tpu.models.dae_problems import (
    Pendulum2D,
    SimpleDAE,
    SynchronousMachineInfiniteBus,
)
from pysdc_tpu.sweepers.dae import FullyImplicitDAE, SemiImplicitDAE
from pysdc_tpu.utils.golden import GoldenStore


def _run(problem_class, sweeper_class, dt, Tend, M=3, restol=1e-12, maxiter=40,
         problem_params=None, u0=None):
    desc = dict(
        problem_class=problem_class,
        problem_params=dict(problem_params or {}),
        sweeper_class=sweeper_class,
        sweeper_params=dict(num_nodes=M, quad_type='RADAU-RIGHT', QI='IE'),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0) if u0 is None else u0
    uend, stats = c.run(u0, 0.0, Tend)
    return uend, stats, P


def convergence_study(M=3):
    """Reference run_convergence_test.py: on the Ascher-Petzold index-2
    linear DAE the differential variables converge at the full collocation
    order (2M-1 for Radau-Right) while the algebraic variable is limited to
    order M — gate both slopes and golden-gate the error series."""
    dts = [2e-2 / 2**i for i in range(4)]
    Tend = 0.4
    err_diff, err_alg = [], []
    for dt in dts:
        uend, _, P = _run(SimpleDAE, FullyImplicitDAE, dt, Tend, M=M,
                          problem_params=dict(newton_tol=1e-14))
        uex = P.u_exact(Tend)
        err_diff.append(float(jnp.max(jnp.abs(uend[:2] - uex[:2]))))
        err_alg.append(float(jnp.abs(uend[2] - uex[2])))

    orders_d = np.log2(np.asarray(err_diff[:-1]) / np.asarray(err_diff[1:]))
    orders_a = np.log2(np.asarray(err_alg[:-1]) / np.asarray(err_alg[1:]))
    for dt, ed, ea in zip(dts, err_diff, err_alg):
        print(f'dt={dt:8.1e}  err_diff={ed:9.2e}  err_alg={ea:9.2e}')
    print(f'measured orders: differential {orders_d.round(2)}, algebraic {orders_a.round(2)}')

    # slopes before hitting the Newton/restol floor: differential well above
    # M (superconvergent toward 2M-1), algebraic at least ~M
    assert orders_d[0] > M + 0.5, f'differential order too low: {orders_d}'
    assert min(orders_a[:2]) > M - 0.7, f'algebraic order too low: {orders_a}'
    assert max(err_diff) < 1e-4 and max(err_alg) < 1e-3
    return err_diff, err_alg


def sweeper_comparison(dt=5e-3, Tend=0.2, M=3):
    """Fully-implicit vs semi-implicit on the same index-2 problem
    (reference accuracy_check_MPI.py compares exactly these two): both land
    in the same accuracy class; the semi-implicit variant, which eliminates
    the algebraic derivative from the unknowns, must not lose accuracy.
    Iteration counts are golden-gated per sweeper."""
    out = {}
    for name, cls in (('fully_implicit', FullyImplicitDAE), ('semi_implicit', SemiImplicitDAE)):
        uend, stats, P = _run(SimpleDAE, cls, dt, Tend, M=M, restol=1e-10,
                              problem_params=dict(newton_tol=1e-14))
        uex = P.u_exact(Tend)
        err = float(jnp.max(jnp.abs(uend - uex)))
        iters = [v for _, v in get_sorted(stats, type='niter')]
        out[name] = (err, iters)
        print(f'{name:15s}: err={err:.3e}, iters={iters}')
        assert err < 5e-9, (name, err)
    ratio = out['semi_implicit'][0] / max(out['fully_implicit'][0], 1e-16)
    assert ratio < 50.0, 'semi-implicit sweeper lost an accuracy class'
    return out


def pendulum_constraint_drift(dt=1e-2, Tend=1.0):
    """Index-3 pendulum over a full swing: the position constraint
    x^2 + y^2 = 1 holds to solver precision at every step (it is an explicit
    row of F), while the *hidden* velocity constraint x*vx + y*vy = 0 —
    never enforced directly — is satisfied at the attained residual level
    (index-3: SDC contracts slowly here, the reference's pendulum2D run
    shows the same behavior)."""

    from pysdc_tpu.core.hooks import Hooks

    class LogConstraint(Hooks):
        def post_step(self, step, level_number):
            super().post_step(step, level_number)
            L = step.levels[level_number]
            L.compute_end_point()
            u = L.uend
            kw = dict(process=step.status.slot, time=L.time, level=L.level_index,
                      iter=step.status.iter, sweep=L.status.sweep)
            self.add_to_stats(type='g_pos', value=float(u[0] ** 2 + u[1] ** 2 - 1.0), **kw)
            self.add_to_stats(type='g_vel', value=float(u[0] * u[2] + u[1] * u[3]), **kw)

    desc = dict(
        problem_class=Pendulum2D,
        problem_params=dict(newton_tol=1e-13),
        sweeper_class=FullyImplicitDAE,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='IE'),
        level_params=dict(dt=dt, restol=1e-12),
        step_params=dict(maxiter=60),
    )
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': LogConstraint}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    g_pos = np.asarray([abs(v) for _, v in get_sorted(stats, type='g_pos')])
    g_vel = np.asarray([abs(v) for _, v in get_sorted(stats, type='g_vel')])
    print(f'pendulum: max |g_pos|={g_pos.max():.2e}, max |g_vel|={g_vel.max():.2e} over {len(g_pos)} steps')
    assert g_pos.max() < 1e-9, 'position constraint drifted'
    assert g_vel.max() < 1e-4, 'hidden velocity constraint beyond residual level'
    return uend


def synchronous_machine(dt=1e-3, Tend=0.05):
    """Reference synchronous_machine_playground.py: 14-variable machine vs
    infinite bus; gate that SDC converges in single-digit iterations, the
    state stays physical, and the run self-converges under dt refinement
    (the error shrinks monotonically — the driving-torque transient limits
    the observable order on this window, as in the reference playground)."""
    uend, stats, P = _run(
        SynchronousMachineInfiniteBus, FullyImplicitDAE, dt, Tend, M=3,
        restol=1e-9, problem_params=dict(newton_tol=1e-12), maxiter=100,
    )
    uhalf, _, _ = _run(
        SynchronousMachineInfiniteBus, FullyImplicitDAE, dt / 2, Tend, M=3,
        restol=1e-9, problem_params=dict(newton_tol=1e-12), maxiter=100,
    )
    uquarter, _, _ = _run(
        SynchronousMachineInfiniteBus, FullyImplicitDAE, dt / 4, Tend, M=3,
        restol=1e-9, problem_params=dict(newton_tol=1e-12), maxiter=100,
    )
    iters = [v for _, v in get_sorted(stats, type='niter')]
    diff1 = float(jnp.max(jnp.abs(uend - uhalf)))
    diff2 = float(jnp.max(jnp.abs(uhalf - uquarter)))
    print(f'synchronous machine: self-convergence {diff1:.3e} -> {diff2:.3e}, '
          f'mean iters={np.mean(iters):.1f}, max={max(iters)}')
    assert diff1 < 1e-5 and diff2 < diff1, 'machine run does not self-converge'
    assert max(iters) < 15, 'machine SDC should converge in single-digit iterations'
    assert np.isfinite(np.asarray(uend)).all()
    return uend, iters


def main():
    err_diff, err_alg = convergence_study()
    cmp = sweeper_comparison()
    pend = pendulum_constraint_drift()
    mach, mach_iters = synchronous_machine()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_18_dae.json'))
    store.check('simple_dae_err_diff', err_diff, rtol=1e-5, atol=1e-14)
    store.check('simple_dae_err_alg', err_alg, rtol=1e-5, atol=1e-14)
    store.check('fully_implicit_niter', cmp['fully_implicit'][1], rtol=0, atol=0)
    store.check('semi_implicit_niter', cmp['semi_implicit'][1], rtol=0, atol=0)
    store.check('pendulum_uend', np.asarray(pend), rtol=1e-8, atol=1e-12)
    store.check('sync_machine_uend', np.asarray(mach), rtol=1e-6, atol=1e-10)
    store.check('sync_machine_niter', mach_iters, rtol=0, atol=0)
    store.flush()
    print('DAE campaign: all gates passed')


if __name__ == '__main__':
    main()
