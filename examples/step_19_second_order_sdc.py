"""Step 19: second-order SDC — stability diagram + Penning trap precision.

The study shape of the reference's ``Second_orderSDC`` project:

- ``harmonic_oscillator_run_stability.py`` / ``stability_simulation.py``:
  map the stability region of Verlet-SDC on the damped oscillator
  x'' = -kappa x - mu x' over the (kappa, mu) plane and the stability
  interval along the undamped axis, as a function of the sweep count K;
- ``penningtrap_run_error.py`` / ``penningtrap_run_work_precision.py``:
  convergence order of Boris-SDC on the single-particle Penning trap at
  FIXED iteration counts (the work-precision axis), against the analytic
  trajectory.

TPU-first twist on the stability scan: instead of assembling the SDC
iteration matrix symbolically (reference ``stability_simulation.py``
builds block matrices in numpy), the one-step propagator S(kappa, mu) is
extracted with ``jax.jacobian`` straight THROUGH the production sweeper
code (predict -> K x update_nodes -> end point), and the whole
(kappa, mu) grid is one ``vmap``-of-``vmap`` jitted program — the entire
diagram is a single XLA dispatch, and it exercises exactly the code that
production runs use.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os
from functools import partial

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI
from pysdc_tpu.models.particles import Particles, PenningTrap3D
from pysdc_tpu.sweepers.boris import BorisSDC
from pysdc_tpu.sweepers.verlet import VerletSweeper
from pysdc_tpu.utils.golden import GoldenStore


class _Oscillator:
    """Traced-coefficient shim: x'' = -kappa x - mu x' (the sweeper only
    calls eval_f, so the stability scan can vmap over the coefficients)."""

    def __init__(self, kappa, mu):
        self.kappa, self.mu = kappa, mu

    def eval_f(self, u: Particles, t):
        return -self.kappa * u.pos - self.mu * u.vel


def _make_propagator(sweeper, K):
    """One-step (dt=1) propagator S(kappa, mu) in R^{2x2} through the real
    sweeper: columns are the responses to unit (x0, v0)."""

    def endpoint(x0v0, kappa, mu):
        prob = _Oscillator(kappa, mu)
        u0 = Particles(pos=x0v0[:1], vel=x0v0[1:])
        st = sweeper.predict(prob, u0, 0.0, 1.0)
        for k in range(K):
            st = sweeper.update_nodes(prob, st, 0.0, 1.0, k)
        ue = sweeper.compute_end_point(st, 0.0, 1.0)
        return jnp.concatenate([ue.pos, ue.vel])

    def spectral_radius(kappa, mu):
        S = jax.jacobian(endpoint)(jnp.zeros(2), kappa, mu)
        tr, det = S[0, 0] + S[1, 1], S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
        disc = jnp.asarray(tr * tr - 4.0 * det, jnp.complex128)
        lam1 = (tr + jnp.sqrt(disc)) / 2.0
        lam2 = (tr - jnp.sqrt(disc)) / 2.0
        return jnp.maximum(jnp.abs(lam1), jnp.abs(lam2))

    return jax.jit(jax.vmap(jax.vmap(spectral_radius, (None, 0)), (0, None)))


def stability_diagram(M=3, Ks=(1, 2, 3, 50), n_grid=40):
    """rho(S) over the (kappa, mu) quarter-plane per sweep count; gate the
    structural facts the reference's stability plots encode:

    - K=1 IS velocity-Verlet (the base sweep): symplectic, so rho sits ON
      the unit circle (to roundoff) throughout its stability interval;
    - K=50 has converged to the Lobatto collocation propagator: symplectic
      again, with the collocation stability interval;
    - intermediate sweep counts are NOT symplectic — even K damps
      (rho < 1), odd K amplifies slightly (rho = 1 + O(iteration error)),
      exactly the alternating bands of the reference's stability figures;
    - physical damping (mu > 0) contracts the propagator."""
    sweeper = VerletSweeper(dict(num_nodes=M, quad_type='LOBATTO'))
    kappas = jnp.linspace(0.02, 18.0, n_grid)
    mus = jnp.linspace(0.0, 18.0, n_grid)
    tol = 1e-9

    intervals, fractions, rhos = {}, {}, {}
    for K in Ks:
        rho = np.asarray(_make_propagator(sweeper, K)(kappas, mus))
        rhos[K] = rho
        unstable = np.nonzero(rho[:, 0] > 1.0 + tol)[0]
        k_max = float(kappas[unstable[0] - 1]) if unstable.size else float(kappas[-1])
        frac_stable = float(np.mean(rho <= 1.0 + tol))
        intervals[K], fractions[K] = k_max, frac_stable
        print(f'K={K:3d}: stable kappa-interval [0, {k_max:6.3f}], '
              f'{100 * frac_stable:5.1f}% of the grid stable')
        assert rho[0, 0] <= 1.0 + 1e-6, 'unstable at the origin'

    # symplectic lanes: unit-circle to roundoff inside the interval
    for K in (1, 50):
        inside = kappas < 0.9 * intervals[K]
        assert np.max(np.abs(rhos[K][np.asarray(inside), 0] - 1.0)) < 1e-9, (
            f'K={K} propagator must be symplectic on the undamped axis')
    # even K damps, and damping mu > 0 contracts at small kappa
    assert np.all(rhos[2][1:8, 0] < 1.0), 'K=2 must be dissipative at small kappa'
    # moderate physical damping contracts the propagator (very large mu*dt
    # is a stiff under-resolved regime where the iterate amplifies again —
    # the reference plots show the same lobe structure)
    assert rhos[2][0, 4] < rhos[2][0, 0] + 1e-12, 'physical damping must contract'
    # the collocation interval covers the practically relevant range
    assert intervals[50] > 4.0
    return intervals, fractions


def penning_work_precision(Ks=(2, 3, 4), dts=(1 / 32, 1 / 64), Tend=0.25):
    """Order of Boris-SDC at fixed iteration counts on the analytic
    single-particle Penning trap (reference penningtrap_run_error.py)."""
    errs = {}
    for K in Ks:
        for dt in dts:
            desc = dict(
                problem_class=PenningTrap3D,
                problem_params=dict(omega_B=25.0, omega_E=4.9, nparts=1, sig=0.1),
                sweeper_class=BorisSDC,
                sweeper_params=dict(num_nodes=3, quad_type='LOBATTO'),
                level_params=dict(dt=dt, restol=-1.0),
                step_params=dict(maxiter=K),
            )
            c = ControllerNonMPI(1, {'logger_level': 40}, desc)
            P = c.MS[0].levels[0].prob
            uend, _ = c.run(P.u_exact(0.0), 0.0, Tend)
            ex = P.u_exact(Tend)
            errs[(K, dt)] = max(
                float(jnp.max(jnp.abs(uend.pos - ex.pos))),
                float(jnp.max(jnp.abs(uend.vel - ex.vel))),
            )
    orders = {}
    for K in Ks:
        orders[K] = float(np.log2(errs[(K, dts[0])] / errs[(K, dts[1])]))
        print(f'K={K}: errors {errs[(K, dts[0])]:.3e} -> {errs[(K, dts[1])]:.3e}, '
              f'order {orders[K]:.2f}')

    # each extra sweep moves the work-precision frontier down until the
    # collocation cap (order 2M-2 = 4 for 3 Lobatto nodes) is reached, after
    # which the error saturates (K=4 matches K=3 — the iterate has converged)
    for K0, K1 in zip(Ks[:-1], Ks[1:]):
        for dt in dts:
            assert errs[(K1, dt)] < errs[(K0, dt)] * 1.05, (K0, K1, dt)
    assert orders[Ks[0]] > 1.7, 'K=2 must be at least second order'
    assert orders[Ks[-1]] > 3.3, 'enough sweeps must reach the collocation order'
    return errs, orders


def main():
    intervals, fractions = stability_diagram()
    errs, orders = penning_work_precision()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_19_second_order.json'))
    store.check('verlet_stability_kmax', [intervals[K] for K in sorted(intervals)], rtol=1e-8, atol=1e-10)
    store.check('verlet_stable_fraction', [fractions[K] for K in sorted(fractions)], rtol=1e-8, atol=1e-10)
    store.check('penning_errors', [errs[k] for k in sorted(errs)], rtol=1e-6, atol=1e-12)
    store.check('penning_orders', [orders[K] for K in sorted(orders)], rtol=1e-4, atol=1e-6)
    store.flush()
    print('second-order SDC campaign: all gates passed')


if __name__ == '__main__':
    main()
