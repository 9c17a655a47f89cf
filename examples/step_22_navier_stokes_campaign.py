"""Step 22: incompressible Navier-Stokes campaign (StroemungsRaum analog).

The study shape of the reference's ``StroemungsRaum`` project (IMEX-SDC
temporal-order verification for the incompressible Navier-Stokes equations
+ physics validation of the flow fields):

- temporal order table: IMEX-SDC at fixed sweep counts K on a nonlinear
  decaying-turbulence flow, gated against a fine-dt reference — order(K)
  climbs with K up to the collocation cap, the project's central table;
- Taylor-Green exactness: the analytic nonlinear TG vortex is reproduced
  to solver precision, and spectrally in space (error independent of N);
- physics dashboard: energy and enstrophy decay monotonically, enstrophy
  faster than energy (2D inverse cascade), the flow stays divergence-free
  to roundoff, and the E(t)/Z(t) series are golden-gated.

The vorticity-streamfunction formulation keeps the whole RHS in Fourier
space: one forward/backward FFT pair per evaluation, batched over
collocation nodes on the MXU-adjacent VPU lanes.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI
from pysdc_tpu.models.navier_stokes import NavierStokesVorticity2D
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.golden import GoldenStore


def _desc(dt, n=64, nu=5e-3, M=3, maxiter=12, restol=1e-11):
    return dict(
        problem_class=NavierStokesVorticity2D,
        problem_params=dict(nvars=(n, n), nu=nu),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=M, QI='LU', quad_type='RADAU-RIGHT'),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )


def order_table(Ks=(2, 3, 4), dts=(0.04, 0.02, 0.01), Tend=0.2, n=64, nu=5e-3):
    """Fixed-sweep temporal order on the nonlinear random-mode flow."""
    c = ControllerNonMPI(1, {'logger_level': 40}, _desc(0.001, n=n, nu=nu))
    P = c.MS[0].levels[0].prob
    w0 = P.u_exact(0.0, kind='random')
    uref, _ = c.run(w0, 0.0, Tend)

    errs, orders = {}, {}
    for K in Ks:
        for dt in dts:
            d = _desc(dt, n=n, nu=nu, maxiter=K, restol=-1.0)
            c2 = ControllerNonMPI(1, {'logger_level': 40}, d)
            u2, _ = c2.run(w0, 0.0, Tend)
            errs[(K, dt)] = float(jnp.max(jnp.abs(u2 - uref)))
        fit = np.polyfit(np.log(dts), np.log([errs[(K, dt)] for dt in dts]), 1)[0]
        orders[K] = float(fit)
        print(f'K={K}: errors ' + ' '.join(f'{errs[(K, dt)]:.2e}' for dt in dts)
              + f'  -> order {fit:.2f}')

    # order grows with the sweep count; K sweeps buy at least order ~K
    assert orders[Ks[0]] > Ks[0] - 0.6, orders
    for K0, K1 in zip(Ks[:-1], Ks[1:]):
        assert orders[K1] > orders[K0] + 0.4, f'extra sweep bought no order: {orders}'
        for dt in dts:
            assert errs[(K1, dt)] < errs[(K0, dt)], (K0, K1, dt)
    return errs, orders


def taylor_green_exactness(Tend=0.5, dt=0.05, nu=1e-2):
    """The analytic nonlinear TG vortex: solver-precision in time and
    spectral in space (the error must NOT change with resolution)."""
    errs = []
    for n in (32, 64):
        c = ControllerNonMPI(1, {'logger_level': 40}, _desc(dt, n=n, nu=nu))
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, Tend)
        errs.append(float(jnp.max(jnp.abs(uend - P.u_exact(Tend)))))
        print(f'TG n={n:3d}: err vs analytic = {errs[-1]:.3e}')
    assert max(errs) < 1e-9, 'Taylor-Green not reproduced to solver precision'
    assert errs[1] < 10 * errs[0] + 1e-12, 'error must be resolution-independent (spectral)'
    return errs


def dashboard(dt=0.02, n_steps=25, n=64, nu=5e-3):
    """Decaying 2D turbulence observables, golden-gated."""
    c = ControllerNonMPI(1, {'logger_level': 40}, _desc(dt, n=n, nu=nu, maxiter=8, restol=1e-9))
    P = c.MS[0].levels[0].prob
    w = P.u_exact(0.0, kind='random')
    E, Z = [P.kinetic_energy(w)], [P.enstrophy(w)]
    t = 0.0
    for _ in range(n_steps):
        w, _ = c.run(w, t, t + dt)
        t += dt
        E.append(P.kinetic_energy(w))
        Z.append(P.enstrophy(w))
    E, Z = np.asarray(E), np.asarray(Z)
    dE, dZ = (E[0] - E[-1]) / E[0], (Z[0] - Z[-1]) / Z[0]
    print(f'dashboard: E {E[0]:.4f} -> {E[-1]:.4f} (-{100 * dE:.1f}%), '
          f'Z {Z[0]:.4f} -> {Z[-1]:.4f} (-{100 * dZ:.1f}%), div={P.divergence(w):.2e}')

    assert np.all(np.diff(E) < 0) and np.all(np.diff(Z) < 0), 'E and Z must decay monotonically'
    assert dZ > dE, '2D inverse cascade: enstrophy decays faster than energy'
    assert P.divergence(w) < 1e-8, 'flow left the divergence-free manifold'

    k, spec = P.energy_spectrum(w)
    tail = spec[len(spec) // 2:].sum() / spec.sum()
    assert tail < 0.01, 'energy piled up at the grid scale — under-resolved'
    return E, Z


def main():
    errs, orders = order_table()
    tg = taylor_green_exactness()
    E, Z = dashboard()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_22_navier_stokes.json'))
    store.check('order_table_errors', [errs[k] for k in sorted(errs)], rtol=1e-6, atol=1e-13)
    store.check('orders', [orders[K] for K in sorted(orders)], rtol=1e-4, atol=1e-8)
    store.check('tg_errors', tg, rtol=1e-4, atol=1e-13)
    store.check('energy_series', E, rtol=1e-8, atol=1e-12)
    store.check('enstrophy_series', Z, rtol=1e-8, atol=1e-12)
    store.flush()
    print('Navier-Stokes campaign: all gates passed')


if __name__ == '__main__':
    main()
