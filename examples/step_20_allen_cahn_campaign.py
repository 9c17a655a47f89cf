"""Step 20: Allen-Cahn campaign — contracting circle + forcing verification.

The study shape of the reference's ``TOMS`` project
(``AllenCahn_contracting_circle.py`` + ``AllenCahn_monitor.py``) and the
``AllenCahn_Bayreuth`` project (``run_simple_forcing_verification.py``,
``run_temp_forcing_verification.py``):

- track the interface radius of the 2D shrinking circle with a per-step
  monitor hook and gate it against the sharp-interface law
  R(t)^2 = R0^2 - 2t, across THREE splittings of the same physics (fully
  implicit, IMEX, multi-implicit) — the TOMS paper's comparison axis;
- verify the mass-conserving time-forcing variant actually conserves the
  total phase mass (the property the Bayreuth forcing runs gate), while
  the plain IMEX spectral variant loses mass as the circle shrinks.

The radius monitor is one fused reduction on device (count of
above-threshold cells), not a host-side scan.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, GenericImplicit, get_sorted
from pysdc_tpu.core.hooks import Hooks
from pysdc_tpu.models.allen_cahn import (
    AllenCahnPeriodicMultiImplicitND,
    AllenCahnPeriodicND,
    AllenCahnPeriodicSemiImplicitND,
)
from pysdc_tpu.models.allen_cahn_spectral import (
    AllenCahnSpectralND,
    AllenCahnSpectralTimeForcing,
)
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.sweepers.multi_implicit import MultiImplicitSweeper
from pysdc_tpu.utils.golden import GoldenStore


class MonitorRadius(Hooks):
    """Interface radius from the covered area (reference
    AllenCahn_monitor.py:26-57 counts threshold-crossing cells)."""

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        L.compute_end_point()
        area = float(jnp.sum(L.uend > 0.5)) * L.prob.dx ** 2
        self.add_to_stats(
            process=step.status.slot, time=L.time, level=L.level_index,
            iter=step.status.iter, sweep=L.status.sweep,
            type='radius', value=float(np.sqrt(max(area, 0.0) / np.pi)),
        )


SPLITTINGS = {
    'fully_implicit': (AllenCahnPeriodicND, GenericImplicit, {}),
    'imex': (AllenCahnPeriodicSemiImplicitND, IMEXSweeper, {}),
    'multi_implicit': (AllenCahnPeriodicMultiImplicitND, MultiImplicitSweeper,
                       {'Q1': 'LU', 'Q2': 'LU'}),
}


def contracting_circle(n=64, dt=1e-3, n_steps=24, radius=0.25, eps=0.04):
    """All three splittings must track R(t)^2 = R0^2 - 2t to interface
    resolution, and agree with each other."""
    series = {}
    for name, (prob_cls, sweeper_cls, extra_sw) in SPLITTINGS.items():
        desc = dict(
            problem_class=prob_cls,
            problem_params=dict(nvars=(n, n), eps=eps, radius=radius, newton_tol=1e-10),
            sweeper_class=sweeper_cls,
            sweeper_params=dict(num_nodes=3, QI='LU', quad_type='RADAU-RIGHT', **extra_sw),
            level_params=dict(dt=dt, restol=1e-8),
            step_params=dict(maxiter=12),
        )
        c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': MonitorRadius}, desc)
        P = c.MS[0].levels[0].prob
        uend, stats = c.run(P.u_exact(0.0), 0.0, n_steps * dt)
        radii = get_sorted(stats, type='radius')
        times = np.asarray([t for t, _ in radii])
        r_num = np.asarray([r for _, r in radii])
        r_exact = np.sqrt(np.maximum(radius**2 - 2.0 * times, 0.0))
        rel = np.abs(r_num - r_exact) / radius
        series[name] = r_num
        print(f'{name:15s}: radius {r_num[0]:.4f} -> {r_num[-1]:.4f} '
              f'(exact {r_exact[-1]:.4f}), max rel dev {rel.max():.3f}')
        # the discrete interface is one cell wide: track to O(dx/radius)
        assert rel.max() < 3.0 / (n * radius), (name, rel.max())
        # the circle must actually shrink monotonically (allow one-cell jitter)
        assert r_num[-1] < r_num[0] - 2e-3, name

    ts = times  # identical grids across splittings
    for a in series.values():
        for b in series.values():
            assert np.max(np.abs(a - b)) < 2.5 / n, 'splittings disagree beyond one cell'
    return ts, series


def mass_conservation(n=64, dt=1e-3, n_steps=20, radius=0.25, eps=0.04):
    """Bayreuth forcing verification: the time-forcing variant holds the
    total mass flat to solver tolerance; the unforced IMEX variant loses
    mass as the circle contracts."""
    masses = {}
    for name, prob_cls in (('forced', AllenCahnSpectralTimeForcing),
                           ('unforced', AllenCahnSpectralND)):
        desc = dict(
            problem_class=prob_cls,
            problem_params=dict(nvars=(n, n), eps=eps, radius=radius, init_type='circle'),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(num_nodes=3, QI='LU', quad_type='RADAU-RIGHT'),
            level_params=dict(dt=dt, restol=1e-9),
            step_params=dict(maxiter=12),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        u0 = P.u_exact(0.0)
        m0 = float(jnp.sum(u0))
        u, t = u0, 0.0
        ms = [1.0]
        for _ in range(n_steps):
            u, _ = c.run(u, t, t + dt)
            t += dt
            ms.append(float(jnp.sum(u)) / m0)
        masses[name] = np.asarray(ms)
        print(f'{name:9s}: relative mass {ms[0]:.6f} -> {ms[-1]:.6f}')

    drift_forced = np.max(np.abs(masses['forced'] - 1.0))
    drift_unforced = np.max(np.abs(masses['unforced'] - 1.0))
    assert drift_forced < 1e-4, f'forced variant must conserve mass, drift {drift_forced:.2e}'
    assert drift_unforced > 10 * drift_forced, 'unforced variant must visibly lose mass'
    return masses


def main():
    ts, series = contracting_circle()
    masses = mass_conservation()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_20_allen_cahn.json'))
    for name, r in sorted(series.items()):
        store.check(f'radius_{name}', r, rtol=1e-7, atol=1e-10)
    store.check('mass_forced', masses['forced'], rtol=1e-8, atol=1e-12)
    store.check('mass_unforced', masses['unforced'], rtol=1e-8, atol=1e-12)
    store.flush()
    print('Allen-Cahn campaign: all gates passed')


if __name__ == '__main__':
    main()
