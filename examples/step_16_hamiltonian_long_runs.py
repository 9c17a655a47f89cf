"""Step 16: Hamiltonian dynamics — long-run energy behavior of Verlet-SDC.

The campaign shape of the reference's ``Hamiltonian`` project
(``solar_system.py``, ``fput.py``, ``harmonic_oscillator.py`` + their
``hamiltonian_output.py`` hooks): march Hamiltonian systems for many
hundreds of steps with the second-order Verlet sweeper, log the energy
every step, and gate the drift:

- harmonic oscillator: relative energy error bounded at ~restol scale over
  the whole run (no secular growth);
- Fermi-Pasta-Ulam-Tsingou: energy bounded while the mode energies mix;
- outer solar system: total energy + drift bounded over hundreds of steps
  (the reference gates exactly this invariant for its 5-body run).

The per-step energy series are golden-gated (first/last segments), pinning
both the integrator and the problem right-hand sides.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, get_sorted
from pysdc_tpu.core.hooks import Hooks
from pysdc_tpu.models.particles import FermiPastaUlamTsingou, HarmonicOscillator, OuterSolarSystem
from pysdc_tpu.sweepers.verlet import VerletSweeper
from pysdc_tpu.utils.golden import GoldenStore


class LogHamiltonian(Hooks):
    """Per-step energy log (reference hamiltonian_output.py)."""

    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        L.compute_end_point()
        self.add_to_stats(
            process=step.status.slot, time=L.time, level=L.level_index,
            iter=step.status.iter, sweep=L.status.sweep,
            type='hamiltonian', value=float(L.prob.eval_hamiltonian(L.uend)),
        )


def run_hamiltonian(problem_class, problem_params, dt, n_steps, num_nodes=3):
    desc = dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=VerletSweeper,
        sweeper_params=dict(num_nodes=num_nodes),
        level_params=dict(dt=dt, restol=1e-12),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': [LogHamiltonian]}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, n_steps * dt)
    H = np.array([v for _, v in get_sorted(stats, type='hamiltonian')])
    return uend, H, P


def main():
    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_16_hamiltonian.json'))

    # harmonic oscillator, 500 steps: the energy error stays BOUNDED at the
    # discretization scale with no secular growth — the long-time signature
    # of the collocation integrator the reference project demonstrates
    _, H, P = run_hamiltonian(HarmonicOscillator, dict(k=1.0, mu=0.0), dt=0.5, n_steps=500)
    drift = np.abs(H - H[0]) / abs(H[0])
    early, late = drift[1:100].max(), drift[-100:].max()
    print(f'harmonic oscillator: 500 steps, drift early {early:.2e} late {late:.2e}')
    assert drift.max() < 5e-4
    assert late < 1.5 * early, 'energy error must not grow secularly'
    store.check('harmonic_H_head', H[:8], rtol=1e-9, atol=1e-14)

    # FPUT: the alpha-chain mixes mode energies but conserves the total
    _, H, P = run_hamiltonian(
        FermiPastaUlamTsingou, dict(npart=128, alpha=0.25), dt=1.0, n_steps=400, num_nodes=3
    )
    drift = np.abs(H - H[0]) / abs(H[0])
    print(f'FPUT (128 particles): 400 steps, max relative energy drift {drift.max():.2e}')
    assert drift.max() < 1e-8, drift.max()
    store.check('fput_H_head', H[:8], rtol=1e-9, atol=1e-14)

    # outer solar system: 5-body gravity, hundreds of steps (reference
    # gates |H - H0|/H0 for exactly this configuration)
    uend, H, P = run_hamiltonian(OuterSolarSystem, dict(sun_only=False), dt=50.0, n_steps=400)
    drift = np.abs(H - H[0]) / abs(H[0])
    print(f'outer solar system: 400 steps of dt=50, max relative energy drift {drift.max():.2e}')
    assert drift.max() < 1e-7, drift.max()  # the reference project's own gate level
    assert bool(jnp.isfinite(uend.pos).all() and jnp.isfinite(uend.vel).all())
    store.check('solar_H_head', H[:8], rtol=1e-9, atol=1e-14)
    store.check('solar_H_tail', H[-8:], rtol=1e-9, atol=1e-14)

    store.flush()
    print('Hamiltonian long-run study: all gates passed')


if __name__ == '__main__':
    main()
