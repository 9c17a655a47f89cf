"""Fast representatives of the heavyweight integration suites.

The full fused/sharded/sparse parity suites compile multi-minute XLA
programs and live in the ``slow`` profile; the ``core`` profile (budgeted
< 5 min on a 2-core host, see README) keeps exactly one small-shape smoke
per lane here so a core run still exercises every execution path:

- fused device-resident block runner vs the virtual controller,
- sharded stage machine on a real (2-device) mesh vs the virtual
  controller,
- the sparse operator stack (assembled CSR -> DIA grid SpMV + structured
  shifted solve) against the eigen lane.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.parallel.mesh import make_mesh
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.parallel.sharded import ShardedController
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.utils.stats import get_sorted


def _desc(nvars):
    return dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=nvars, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=20),
        space_transfer_params=dict(rorder=2, iorder=2, periodic=True),
    )


def test_fused_lane_smoke_parity():
    """Fused whole-block runner == virtual controller (small shape)."""
    desc = _desc([(16, 16), (8, 8)])
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    ref = ControllerNonMPI(2, cp, desc)
    P = ref.MS[0].levels[0].prob
    u_ref, s_ref = ref.run(P.u_exact(0.0), 0.0, 0.1)
    it_ref = [v for _, v in get_sorted(s_ref, type='niter')]

    sh = ShardedController(2, cp, desc)
    u_sh, s_sh = sh.run_fused(P.u_exact(0.0), 0.0, 0.1)
    it_sh = [v for _, v in get_sorted(s_sh, type='niter')]
    assert it_ref == it_sh, (it_ref, it_sh)
    assert float(jnp.max(jnp.abs(u_ref - u_sh))) < 1e-11


def test_sharded_stage_smoke_parity():
    """Stage machine on a 2-device time mesh == virtual controller."""
    desc = _desc([(16, 16), (8, 8)])
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    ref = ControllerNonMPI(2, cp, desc)
    P = ref.MS[0].levels[0].prob
    u_ref, s_ref = ref.run(P.u_exact(0.0), 0.0, 0.1)
    it_ref = [v for _, v in get_sorted(s_ref, type='niter')]

    mesh = make_mesh(n_time=2, n_space=1)
    sh = ShardedController(2, cp, desc, mesh=mesh)
    u_sh, s_sh = sh.run(P.u_exact(0.0), 0.0, 0.1, lane='stage')
    it_sh = [v for _, v in get_sorted(s_sh, type='niter')]
    assert it_ref == it_sh, (it_ref, it_sh)
    assert float(jnp.max(jnp.abs(u_ref - u_sh))) < 1e-11


def test_sparse_stack_smoke():
    """Assembled sparse operator (DIA grid SpMV + pcg solve) vs eigen lane."""
    from pysdc_tpu.models.var_diffusion import VarCoeffDiffusion2D
    from pysdc_tpu.ops.linop import SeparableFDOperator

    n = 24
    vp = VarCoeffDiffusion2D(nvars=(n, n), coeff_fn=lambda X, Y: 0.1 * (0 * X + 0 * Y + 1.0))
    eig = SeparableFDOperator(
        [dict(size=n, dx=1.0 / (n + 1), derivative=2, order=2, bc='dirichlet')] * 2,
        scale=0.1,
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n, n)))
    assert float(jnp.max(jnp.abs(vp.A.apply(u) - eig.apply(u)))) < 1e-10
    x_sp = vp.A.solve_shifted(u, 1e-2)
    x_ei = eig.solve_shifted(u, 1e-2)
    assert float(jnp.max(jnp.abs(x_sp - x_ei))) < 1e-8
