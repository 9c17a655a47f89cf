"""Step 15: fast-wave slow-wave IMEX-SDC stability study.

The campaign shape of the reference's ``FastWaveSlowWave`` project
(``plot_stability.py``, ``plot_stab_vs_k.py``, based on Ruprecht & Speck's
acoustic-advection analysis): for the split Dahlquist test problem

    u' = lambda_fast * u + lambda_slow * u,   lambda on the imaginary axis,

the IMEX-SDC update after K sweeps defines a stability function
R(lambda_f dt, lambda_s dt).  The batched Dahlquist problem evaluates a
whole (fast, slow) CFL grid in ONE SDC run (the state axis carries every
lambda pair — the TPU-native way to draw a stability map), and the gates
pin the project's headline findings:

- the implicit fast wave is unconditionally stable: for slow CFL well under
  its explicit limit, |R| <= 1 across the whole fast axis;
- the explicit slow wave keeps its CFL restriction: large slow CFL is
  unstable no matter how small the fast wave;
- more sweeps shrink |R| toward the collocation limit.

An accuracy gate runs the actual 1D acoustic-advection PDE (spectral IMEX,
``models/acoustic.py``) against its d'Alembert solution.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, IMEXSweeper, get_sorted
from pysdc_tpu.models.acoustic import AcousticAdvection1D
from pysdc_tpu.models.dahlquist import DahlquistIMEX
from pysdc_tpu.utils.golden import GoldenStore


def stability_map(n_sweeps, fast_vals, slow_vals):
    """|R| on the (fast, slow) imaginary-CFL grid after n_sweeps sweeps."""
    F, S = np.meshgrid(fast_vals, slow_vals, indexing='ij')
    lam_fast = 1j * F.ravel()
    lam_slow = 1j * S.ravel()
    desc = dict(
        problem_class=DahlquistIMEX,
        problem_params=dict(lambdas_implicit=lam_fast, lambdas_explicit=lam_slow),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='IE', QE='EE'),
        level_params=dict(dt=1.0, restol=-1.0, nsweeps=n_sweeps),
        step_params=dict(maxiter=1),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = jnp.ones(P.shape, P.dtype)
    uend, _ = c.run(u0, 0.0, 1.0)
    return np.abs(np.asarray(uend)).reshape(F.shape)


def main():
    fast = np.linspace(0.0, 10.0, 26)
    slow = np.linspace(0.0, 2.0, 21)
    R3 = stability_map(3, fast, slow)
    R5 = stability_map(5, fast, slow)

    # finite-K IMEX SDC has marginal instability pockets along the fast
    # axis (|R| barely above 1 — the FastWaveSlowWave paper's finding);
    # they must stay tiny, and vanish entirely in the collocation limit
    safe_slow = slow <= 0.6
    for K, R in ((3, R3), (5, R5)):
        mx = float(R[:, safe_slow].max())
        print(f'K={K}: max |R| on (fast x slow<=0.6) grid: {mx:.6f}')
        assert mx < 1.001, (K, mx)
    R12 = stability_map(12, fast, slow)
    frac_stable = float(np.mean(R12[:, safe_slow] <= 1 + 1e-10))
    print(f'K=12 (collocation limit): stable fraction {frac_stable:.3f}')
    assert frac_stable == 1.0, 'the collocation limit must be unconditionally stable'

    # explicit slow wave keeps a CFL limit: beyond slow CFL ~2.7 the
    # amplification takes off regardless of the (implicit) fast CFL
    slow_wide = np.linspace(0.0, 4.0, 17)
    Rw = stability_map(3, fast[:6], slow_wide)
    mx = Rw.max(axis=0)
    print(f'K=3: max |R| vs slow CFL: {np.round(mx, 3).tolist()}')
    assert mx[slow_wide <= 2.25].max() < 1.001, 'stable below the slow limit'
    assert mx[-1] > 2.0, 'the explicit slow CFL limit must persist'

    # sweeps converge toward the collocation stability function (|R| = 1
    # for purely imaginary spectra): K=5 must sit closer to it than K=3
    err3 = np.max(np.abs(R3 - R12)[:, safe_slow])
    err5 = np.max(np.abs(R5 - R12)[:, safe_slow])
    print(f'distance to collocation limit: K=3 {err3:.3f}, K=5 {err5:.3f}')
    assert err5 < err3, (err3, err5)

    # accuracy on the real acoustic-advection PDE vs d'Alembert
    desc = dict(
        problem_class=AcousticAdvection1D,
        problem_params=dict(nvars=512, cs=1.0, cadv=0.1, waveno=5),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', QI='IE', QE='EE'),
        level_params=dict(dt=1.0 / 154, restol=1e-12),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 20.0 / 154)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(20.0 / 154))))
    iters = [v for _, v in get_sorted(stats, type='niter')]
    print(f'acoustic-advection: err {err:.3e}, iters {iters}')
    assert err < 1e-4, err

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_15_fwsw.json'))
    store.check('stability_R3_slice', R3[:, 5], rtol=1e-8, atol=1e-12)
    store.check('stability_R5_slice', R5[:, 5], rtol=1e-8, atol=1e-12)
    store.check('acoustic_niter', iters, rtol=0, atol=0)
    store.flush()
    print('fast-wave slow-wave study: all gates passed')


if __name__ == '__main__':
    main()
