"""Step 14: SDC showdown — implicitness variants compared at matched accuracy.

The campaign shape of the reference's ``SDC_showdown`` project
(``SDC_timing_Fisher.py:83-168``, ``SDC_timing_GrayScott.py``): run the same
problem under every implicit-splitting variant of SDC — fully-implicit
(Newton over the whole RHS), semi-implicit (stiff diffusion implicit,
reaction explicit), and multi-implicit (diffusion and reaction implicit but
solved separately) — and compare iteration counts and solution agreement at
a shared tolerance.  The reference gates mean iterations and error per
variant; here each variant's iteration series is golden-gated and the
variants must agree with each other to discretization accuracy.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, GenericImplicit, IMEXSweeper, MultiImplicitSweeper, get_sorted
from pysdc_tpu.models.fisher import GeneralizedFisher1D
from pysdc_tpu.models.gray_scott import (
    GrayScott,
    GrayScottLinearIMEX,
    GrayScottMultiImplicit,
    GrayScottMultiImplicitLinear,
)
from pysdc_tpu.utils.golden import GoldenStore


def run_variant(problem_class, sweeper_class, sweeper_extra, problem_params, dt, Tend):
    desc = dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=sweeper_class,
        sweeper_params={'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'LU', **sweeper_extra},
        level_params=dict(dt=dt, restol=1e-9),
        step_params=dict(maxiter=50),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    return uend, iters, P


def fisher_showdown(store):
    """Fully-implicit SDC on the traveling-wave Fisher problem (the
    reference's fisher gate: err <= 9.2e-5, mean iters <= 10)."""
    uend, iters, P = run_variant(
        GeneralizedFisher1D, GenericImplicit, {},
        dict(nvars=255, nu=1.0, lambda0=2.0, newton_tol=1e-11), dt=0.01, Tend=0.1,
    )
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.1))))
    print(f'fisher fully-implicit: mean iters {np.mean(iters):.2f}, err {err:.3e}')
    assert err < 9.2e-5, err
    assert np.mean(iters) <= 10, iters
    store.check('fisher_fully_implicit_niter', iters, rtol=0, atol=0)


def gray_scott_showdown(store):
    variants = {
        'semi-implicit': (GrayScott, IMEXSweeper, dict(QE='EE')),
        'semi-implicit-linear': (GrayScottLinearIMEX, IMEXSweeper, dict(QE='EE')),
        'multi-implicit': (GrayScottMultiImplicit, MultiImplicitSweeper, dict(Q1='LU', Q2='LU')),
        'multi-implicit-linear': (
            GrayScottMultiImplicitLinear, MultiImplicitSweeper, dict(Q1='LU', Q2='LU'),
        ),
    }
    params = dict(nvars=(64, 64), Du=1e-4, Dv=1e-5, A=0.04, B=0.1, L=2.0)
    ends, all_iters = {}, {}
    for name, (cls, sweeper, extra) in variants.items():
        p = dict(params)
        if 'multi' in name:
            p.update(newton_tol=1e-11)
        uend, iters, _ = run_variant(cls, sweeper, extra, p, dt=1.0, Tend=4.0)
        ends[name] = uend
        all_iters[name] = iters
        print(f'gray-scott {name:22s}: iters {iters}')
        assert max(iters) < 50, name
        store.check(f'gray_scott_{name}_niter', iters, rtol=0, atol=0)

    # all four splittings integrate the SAME PDE: at restol 1e-9 their
    # solutions agree far below the reaction scale (the reference's
    # cross-variant consistency idea)
    names = list(variants)
    for other in names[1:]:
        gap = float(jnp.max(jnp.abs(ends[other] - ends[names[0]])))
        print(f'  {other} vs {names[0]}: max gap {gap:.3e}')
        assert gap < 1e-4, (other, gap)

    # the splittings trade implicit-solve cost against iteration count; none
    # may need more than ~2x the iterations of the best
    means = {k: np.mean(v) for k, v in all_iters.items()}
    assert max(means.values()) <= 2.5 * min(means.values()), means


def main():
    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_14_showdown.json'))
    fisher_showdown(store)
    gray_scott_showdown(store)
    store.flush()
    print('SDC showdown: all gates passed')


if __name__ == '__main__':
    main()
