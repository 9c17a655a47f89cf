"""Newton-linearized node-parallel sweepers (parallelSDC project family)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu import ControllerNonMPI, GenericImplicit, get_sorted
from pysdc_tpu.models.fisher import GeneralizedFisher1D
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.sweepers.linearized import LinearizedImplicitParallel


def _desc(problem_class, problem_params, sweeper_class, sweeper_params, dt, restol=1e-10,
          maxiter=50):
    return dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=sweeper_class,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT', **sweeper_params),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )


def _run(desc, Tend):
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    return uend, [v for _, v in get_sorted(stats, type='niter')], P


def test_linearized_matches_generic_implicit_fixed_point():
    """All sweepers iterate to the same collocation solution: Newton-SDC
    (basis='Q') and standard LU-SDC agree on van der Pol at restol."""
    pp = dict(mu=2.0, newton_tol=1e-12)
    u_lin, _, _ = _run(_desc(VanDerPol, pp, LinearizedImplicitParallel,
                             dict(jacobian=0, basis='Q'), 0.05), 0.25)
    u_ref, _, _ = _run(_desc(VanDerPol, pp, GenericImplicit, dict(QI='LU'), 0.05), 0.25)
    assert float(jnp.max(jnp.abs(u_lin - u_ref))) < 1e-8


@pytest.mark.parametrize('cfg', [
    dict(jacobian=0, basis='Q'),        # linearized_implicit_fixed_parallel
    dict(jacobian=0, basis='QI', QI='LU'),  # ..._fixed_parallel_prec
    dict(jacobian='per_node', basis='QI', QI='LU'),  # linearized_implicit_parallel
])
def test_linearized_variants_converge_fisher(cfg):
    """All three reference-equivalent configs converge on the generalized
    Fisher traveling wave and track the analytic solution."""
    pp = dict(nvars=127, nu=1.0, lambda0=2.0, newton_tol=1e-12)
    uend, iters, P = _run(_desc(GeneralizedFisher1D, pp, LinearizedImplicitParallel,
                                cfg, 0.01, restol=1e-10), 0.05)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.05))))
    assert max(iters) < 50, (cfg, iters)
    assert err < 5e-6, (cfg, err)


def test_newton_sdc_beats_preconditioned_sweeps():
    """The newton_vs_sdc study (reference projects/parallelSDC/newton_vsdc
    _sdc.py): diagonalizing the FULL collocation matrix (exact linearized
    collocation solve per iteration) converges in no more iterations than
    sweeping with the LU preconditioner."""
    pp = dict(mu=5.0, newton_tol=1e-12)
    _, it_newton, _ = _run(_desc(VanDerPol, pp, LinearizedImplicitParallel,
                                 dict(jacobian=0, basis='Q'), 0.02), 0.1)
    _, it_sdc, _ = _run(_desc(VanDerPol, pp, GenericImplicit, dict(QI='LU'), 0.02), 0.1)
    assert np.mean(it_newton) <= np.mean(it_sdc) + 1e-9, (it_newton, it_sdc)


def test_invalid_params_rejected():
    from pysdc_tpu.core.errors import ParameterError

    with pytest.raises(ParameterError):
        LinearizedImplicitParallel(dict(num_nodes=3, jacobian=7))
    with pytest.raises(ParameterError):
        LinearizedImplicitParallel(dict(num_nodes=3, basis='S'))
