"""Step 11: SDC convergence theory (the AsympConv / TOMS analog).

Counterpart of the reference's AsympConv project (PFASST/SDC convergence
theory: spectral radius of the preconditioned iteration over the complex
dt*lambda plane) and the TOMS paper's order tables:

  (1) For Dahlquist u' = lambda*u, the SDC error iteration is
          e^{k+1} = K(dt*lambda) e^k,
          K(z) = (I - z*QI)^{-1} z (Q - QI).
      The spectral radius rho(K) predicts the contraction factor.  Checks:
      LU ("stiff decay") has rho -> 0 as z -> -inf, IE stays bounded < 1
      on the negative real axis, and the *measured* contraction of actual
      device sweeps matches rho within a few percent.
  (2) An order table over problems x sweep counts: k sweeps of SDC give
      order min(k, 2M-1) in dt (TOMS-style verification table).
"""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, GenericImplicit
from pysdc_tpu.models.dahlquist import Dahlquist
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.ops.collocation import get_collocation
from pysdc_tpu.ops.qdelta import qdelta_implicit


def iteration_matrix(z, coll, QI):
    """K(z) for the preconditioned Dahlquist sweep (M x M)."""
    M = coll.num_nodes
    Q = coll.q
    QId = QI[1:, 1:]
    return np.linalg.solve(np.eye(M) - z * QId, z * (Q - QId))


def spectral_radius_scan():
    coll = get_collocation(3, 'LEGENDRE', 'RADAU-RIGHT')
    rows = {}
    zs = -np.logspace(-2, 6, 30)
    for qi in ('IE', 'LU', 'MIN-SR-S'):
        QI = qdelta_implicit(coll, qi)
        rows[qi] = np.array([max(abs(np.linalg.eigvals(iteration_matrix(z, coll, QI)))) for z in zs])
    print('rho(K) on the negative real axis (z = dt*lambda):')
    print(f'{"z":>12} ' + ' '.join(f'{q:>10}' for q in rows))
    for i in (0, 9, 19, 29):
        print(f'{zs[i]:>12.2e} ' + ' '.join(f'{rows[q][i]:>10.3e}' for q in rows))

    # LU's stiff decay: rho -> 0 in the stiff limit (Weiser's result);
    # the decay is ~O(1/|z|), so gate the magnitude and the trend
    assert rows['LU'][-1] < 1e-3, rows['LU'][-1]
    assert rows['LU'][-1] < 1e-2 * max(rows['LU'])  # decays off its mid-range peak
    # IE contracts on the whole scanned axis but does NOT decay to zero
    assert np.all(rows['IE'] < 1.0) and rows['IE'][-1] > 0.1
    # MIN-SR-S is competitive with LU in the non-stiff regime
    assert np.all(rows['MIN-SR-S'][:10] < 1.0)
    return coll, rows, zs


def measured_contraction_matches_theory():
    """Drive real device sweeps on Dahlquist and compare the error
    contraction against rho(K)."""
    lam, dt = -2.0, 0.5
    coll = get_collocation(3, 'LEGENDRE', 'RADAU-RIGHT')
    prob = Dahlquist(lambdas=[lam], u0=1.0)
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'IE'})

    # collocation fixed point: u* = (I - z Q)^{-1} 1 u0
    z = dt * lam
    M = coll.num_nodes
    ustar = np.linalg.solve(np.eye(M) - z * coll.q, np.ones(M))

    state = sweep.predict(prob, prob.u_exact(0.0), 0.0, dt, 0.0)
    errs = []
    for _ in range(12):
        state = sweep.update_nodes(prob, state, 0.0, dt, 0)
        errs.append(float(np.max(np.abs(np.asarray(state.u[1:]).ravel() - ustar))))
    # complex eigenvalue pairs make per-sweep ratios oscillate, so compare
    # the geometric-mean rate over the asymptotic window against rho(K)
    rate = (errs[11] / errs[5]) ** (1.0 / 6.0)
    QI = qdelta_implicit(coll, 'IE')
    rho = max(abs(np.linalg.eigvals(iteration_matrix(z, coll, QI))))
    print(f'measured contraction {rate:.4f} vs rho(K) {rho:.4f}')
    assert abs(rate - rho) < 0.25 * rho


def order_table():
    """TOMS-style order verification: k sweeps -> order min(k, 2M-1)."""
    print(f'{"problem":>10} {"k":>3} {"measured order":>15} {"expected":>9}')
    for k in (1, 2, 3):
        errs = []
        dts = [0.1, 0.05, 0.025]
        for dt in dts:
            desc = dict(
                problem_class=HeatND,
                problem_params=dict(nu=0.1, freq=2, nvars=64, bc='periodic'),
                sweeper_class=GenericImplicit,
                sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
                level_params=dict(restol=-1.0, dt=dt),
                step_params=dict(maxiter=k),
            )
            c = ControllerNonMPI(1, {'logger_level': 40}, desc)
            P = c.MS[0].levels[0].prob
            uend, _ = c.run(P.u_exact(0.0), 0.0, 0.4)
            errs.append(float(jnp.max(jnp.abs(uend - P.u_exact(0.4)))))
        orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(dts) - 1)]
        expected = min(k, 5)
        print(f'{"heat":>10} {k:>3} {np.mean(orders):>15.2f} {expected:>9}')
        assert np.mean(orders) > expected - 0.4, (k, orders)


def main():
    spectral_radius_scan()
    measured_contraction_matches_theory()
    order_table()


if __name__ == '__main__':
    main()
