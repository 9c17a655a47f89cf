"""Step 23: Rayleigh-Benard campaign — Nusselt history, CFL stepping, 3D.

The campaign shape of the reference's ``RayleighBenard`` project (the
Nusselt-number production runs behind `RayleighBenard.py` +
`CFLLimit`): march 2D convection from a perturbed conduction state
through onset, track all three Nusselt numbers per step, drive the step
size with the convective CFL limit, and smoke the 3D variant against its
incompressibility constraint.

Gates encode the physics the reference monitors in production:
- conduction floor: no Nusselt number dips below ~1;
- onset: the volume-averaged Nu grows past the conduction value and the
  in-transient plate asymmetry stays bounded;
- the CFL controller actually adapts dt and never exceeds its own bound;
- the 3D field stays divergence-free at spectral accuracy.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, IMEXSweeper, get_sorted
from pysdc_tpu.core.hooks import Hooks
from pysdc_tpu.models.rayleigh_benard import CFLLimit, RayleighBenard, RayleighBenard3D
from pysdc_tpu.utils.golden import GoldenStore


class LogNusselt(Hooks):
    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        L.compute_end_point()
        nus = L.prob.compute_Nusselt_numbers(L.uend)
        self.add_to_stats(
            process=step.status.slot, time=L.time, level=L.level_index,
            iter=step.status.iter, sweep=L.status.sweep,
            type='nusselt_V', value=float(nus['V']),
        )


def nusselt_history(Tend=10.0, dt=0.02, nx=32, nz=16, Ra=2e6):
    """Fixed-dt onset run with a per-step Nusselt monitor."""
    description = dict(
        problem_class=RayleighBenard,
        problem_params=dict(nx=nx, nz=nz, Rayleigh=Ra, Prandtl=1.0),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=dt, restol=-1),
        step_params=dict(maxiter=4),
    )
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': LogNusselt}, description)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0, noise_level=1e-3), 0.0, Tend)
    nu_v = np.asarray([v for _, v in get_sorted(stats, type='nusselt_V')])
    nus = P.compute_Nusselt_numbers(uend)
    print(f'Nu_V: start {nu_v[0]:.3f}, end {nu_v[-1]:.3f}; '
          f"plates t={nus['t']:.3f} b={nus['b']:.3f}")

    assert nu_v.min() > 0.9, 'Nusselt dipped below the conduction floor'
    assert nu_v[-1] > 1.5, 'convection did not set in'
    assert abs(nus['t'] - nus['b']) < 0.5 * nus['V'], 'plate asymmetry out of band'
    assert bool(jnp.isfinite(uend).all())
    return nu_v, uend, Tend


def cfl_adaptive_run(u0, t0, duration=1.0, nx=32, nz=16, Ra=2e6, cfl=0.4):
    """CFLLimit drives dt from a DEVELOPED convecting state (from the onset
    run): it must adapt (dt drops below the cap once plumes are moving) and
    never exceed its own cap."""
    from pysdc_tpu.hooks.logging_hooks import LogStepSize

    description = dict(
        problem_class=RayleighBenard,
        problem_params=dict(nx=nx, nz=nz, Rayleigh=Ra, Prandtl=1.0),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=-1),
        step_params=dict(maxiter=4),
        convergence_controllers={CFLLimit: dict(cfl=cfl, dt_max=0.05)},
    )
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': LogStepSize}, description)
    uend, stats = c.run(u0, t0, t0 + duration)
    dts = np.asarray([v for _, v in get_sorted(stats, type='dt')])
    print(f'CFL run: {len(dts)} steps, dt in [{dts.min():.4f}, {dts.max():.4f}]')
    assert dts.max() <= 0.05 + 1e-12, 'dt_max cap violated'
    assert dts.min() < 0.05 - 1e-12, 'CFL limiter never engaged'
    assert bool(jnp.isfinite(uend).all())
    return dts


def three_d_smoke(n_steps=5, dt=0.01, nx=16, ny=16, nz=8, Ra=1e5):
    """3D variant: divergence-free to spectral accuracy, finite fields,
    Nusselt numbers at the conduction scale for the short horizon."""
    description = dict(
        problem_class=RayleighBenard3D,
        problem_params=dict(nx=nx, ny=ny, nz=nz, Rayleigh=Ra, Prandtl=1.0),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=dt, restol=-1),
        step_params=dict(maxiter=4),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, description)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0, noise_level=1e-3), 0.0, n_steps * dt)
    div = float(jnp.max(jnp.abs(P.compute_divergence(uend))))
    nus = P.compute_Nusselt_numbers(uend)
    print(f"3D: div={div:.2e}, Nu_V={nus['V']:.3f}")
    assert div < 1e-6, '3D flow left the incompressible manifold'
    assert 0.5 < nus['V'] < 3.0
    assert bool(jnp.isfinite(uend).all())
    return div, nus['V']


def main():
    nu_v, u_dev, t_dev = nusselt_history()
    dts = cfl_adaptive_run(u_dev, t_dev)
    div, nu3 = three_d_smoke()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_23_rayleigh_benard.json'))
    store.check('nusselt_series', nu_v[:: max(1, len(nu_v) // 40)], rtol=1e-7, atol=1e-10)
    store.check('cfl_dts', dts, rtol=1e-7, atol=1e-10)
    store.check('rb3d', [div, nu3], rtol=1e-6, atol=1e-9)
    store.flush()
    print('Rayleigh-Benard campaign: all gates passed')


if __name__ == '__main__':
    main()
