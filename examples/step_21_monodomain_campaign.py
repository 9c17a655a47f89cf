"""Step 21: Monodomain campaign — ESDC vs IMEX across ionic models.

The study shape of the reference's ``Monodomain`` project
(``run_scripts/run_MonodomainODE.py`` + the ESDC paper tables): march the
monodomain equation with physiological ionic membrane models and compare
the exponential Rush-Larsen SDC integrator (ESDC / IMEXEXP) against plain
IMEX SDC on the axes the paper reports:

- iteration counts: ESDC's exponential treatment of the stiff gating
  variables keeps SDC iterations LOW AND FLAT as the ionic model gets
  stiffer, where plain IMEX SDC pays iterations (or diverges);
- accuracy: at matched dt the two integrators agree on the propagating
  action-potential front;
- action-potential physiology: upstroke amplitude and resting return for
  Hodgkin-Huxley, golden-gated.

The ionic RHS evaluations batch over the space dimension on the VPU (one
vmapped kernel per model); the native C++ implementations of the same
models (``native/ionicmodels``) are cross-gated in ``tests/test_monodomain``.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, get_sorted
from pysdc_tpu.models.monodomain import MonodomainIMEX, MonodomainIMEXEXP
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.sweepers.imexexp import IMEXEXPSweeper
from pysdc_tpu.utils.golden import GoldenStore


def _run(problem_class, sweeper_class, sweeper_params, pp, dt, Tend, restol=1e-8, maxiter=50):
    desc = dict(
        problem_class=problem_class,
        problem_params=dict(pp),
        sweeper_class=sweeper_class,
        sweeper_params=dict(sweeper_params),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    return uend, iters, P


def iteration_comparison(dt=0.05, Tend=0.5, nvars=128):
    """ESDC vs IMEX on HH monodomain at a production step size: both
    converge in the same iteration class and agree on the propagating
    action-potential front (the paper's table axis)."""
    pp = dict(nvars=nvars, ionic_model='hodgkinhuxley', diff=0.1, L=10.0)
    out = {}
    u_esdc, it_esdc, _ = _run(
        MonodomainIMEXEXP, IMEXEXPSweeper, dict(num_nodes=3, QI='IE'), pp, dt, Tend)
    u_imex, it_imex, P = _run(
        MonodomainIMEX, IMEXSweeper, dict(num_nodes=3, QI='LU'), pp, dt, Tend)
    out['esdc'] = it_esdc
    out['imex'] = it_imex
    print(f'HH dt={dt}: ESDC iters mean {np.mean(it_esdc):.2f} max {max(it_esdc)}; '
          f'IMEX iters mean {np.mean(it_imex):.2f} max {max(it_imex)}')

    # both converge, in the same iteration class (within 1.5x of each other)
    assert max(it_esdc) < 50 and max(it_imex) < 50
    assert np.mean(it_esdc) < 1.5 * np.mean(it_imex), (np.mean(it_esdc), np.mean(it_imex))

    # the two integrators must agree on the front (voltage component)
    diff = float(jnp.max(jnp.abs(u_esdc[0] - u_imex[0])))
    v_scale = float(jnp.max(jnp.abs(u_imex[0])))
    print(f'front agreement: max |V_esdc - V_imex| = {diff:.3e} (scale {v_scale:.1f})')
    assert diff < 0.05 * v_scale, 'integrators disagree on the AP front'
    return out, u_esdc


def large_dt_robustness(dt=0.2, Tend=0.6, nvars=128, maxiter=60):
    """The ESDC paper's headline regime: at a step size where plain IMEX
    SDC stalls against maxiter (the explicit gating stiffness dominates),
    the exponential Rush-Larsen treatment still converges."""
    pp = dict(nvars=nvars, ionic_model='hodgkinhuxley', diff=0.1, L=10.0)
    _, it_esdc, _ = _run(MonodomainIMEXEXP, IMEXEXPSweeper, dict(num_nodes=3, QI='IE'),
                         pp, dt, Tend, maxiter=maxiter)
    _, it_imex, _ = _run(MonodomainIMEX, IMEXSweeper, dict(num_nodes=3, QI='LU'),
                         pp, dt, Tend, maxiter=maxiter)
    print(f'HH dt={dt}: ESDC max iters {max(it_esdc)}; IMEX max iters {max(it_imex)} '
          f'(maxiter {maxiter})')
    assert max(it_esdc) < maxiter, 'ESDC must still converge at the large step'
    assert max(it_imex) >= maxiter, 'IMEX should stall here — regime probe is off'
    return it_esdc, it_imex


def stiffness_flatness(dts=(0.1, 0.05, 0.025), Tend=0.5, nvars=128):
    """ESDC iteration counts stay bounded and shrink with dt — O(1)
    iterations in the production regime, not O(dt^-1)."""
    pp = dict(nvars=nvars, ionic_model='hodgkinhuxley', diff=0.1, L=10.0)
    means = []
    for dt in dts:
        _, iters, _ = _run(MonodomainIMEXEXP, IMEXEXPSweeper, dict(num_nodes=3, QI='IE'),
                           pp, dt, Tend)
        means.append(float(np.mean(iters)))
        print(f'ESDC dt={dt:6.3f}: mean iters {means[-1]:.2f}')
    assert all(a >= b - 1e-9 for a, b in zip(means[:-1], means[1:])), (
        f'iterations must not grow as dt shrinks: {means}')
    assert max(means) < 16.0
    return means


def action_potential_physiology(dt=0.02, Tend=1.5, nvars=128):
    """HH action potential: stimulated upstroke overshoots past +90 mV
    relative to rest (in the model's shifted units the peak exceeds the
    resting value by the standard ~100 mV swing) and begins repolarizing."""
    pp = dict(nvars=nvars, ionic_model='hodgkinhuxley', diff=0.1, L=10.0)
    uend, iters, P = _run(MonodomainIMEXEXP, IMEXEXPSweeper, dict(num_nodes=3, QI='IE'),
                          pp, dt, Tend, restol=1e-9)
    V = np.asarray(uend[0])
    V_rest = float(np.asarray(P.u_exact(0.0))[0].min())
    swing = float(V.max()) - V_rest
    print(f'AP: rest {V_rest:.2f}, peak {V.max():.2f}, swing {swing:.2f} mV')
    assert swing > 80.0, 'action potential upstroke missing'
    assert np.isfinite(V).all()
    return V


def main():
    iters, u_esdc = iteration_comparison()
    it_esdc_big, it_imex_big = large_dt_robustness()
    means = stiffness_flatness()
    V = action_potential_physiology()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_21_monodomain.json'))
    store.check('hh_esdc_niter', iters['esdc'], rtol=0, atol=0)
    store.check('hh_imex_niter', iters['imex'], rtol=0, atol=0)
    store.check('hh_esdc_niter_large_dt', it_esdc_big, rtol=0, atol=0)
    store.check('esdc_mean_iters_vs_dt', means, rtol=1e-9, atol=1e-12)
    store.check('ap_voltage_profile', V[:: max(1, len(V) // 32)], rtol=1e-6, atol=1e-9)
    store.flush()
    print('Monodomain campaign: all gates passed')


if __name__ == '__main__':
    main()
