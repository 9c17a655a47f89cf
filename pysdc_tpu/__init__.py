"""pysdc_tpu: a TPU-native parallel-in-time framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
`pySDC <https://github.com/Parallel-in-Time/pySDC>`_: spectral deferred
corrections, MLSDC with FAS corrections, PFASST time parallelism over device
meshes, ParaDiag, Runge-Kutta/multistep/Verlet/Boris/DAE integrators,
convergence control (adaptivity, error estimators, restarts, resilience,
event detection), hooks/stats, and a library of ODE/PDE problems on
TPU-native operator layers (stencil/FFT/eigen direct solves, Chebyshev
spectral methods, Newton-Krylov).

Quick start::

    from pysdc_tpu import ControllerNonMPI, GenericImplicit
    from pysdc_tpu.models.heat import HeatND

    description = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.1, restol=1e-10),
        step_params=dict(maxiter=20),
    )
    controller = ControllerNonMPI(1, {'logger_level': 30}, description)
    prob = controller.MS[0].levels[0].prob
    uend, stats = controller.run(prob.u_exact(0.0), 0.0, 1.0)
"""

from pysdc_tpu.core.precision import configure_default_matmul_precision

# TPU numerics policy: restol/e_tol-driven termination needs full-precision
# matmuls (bf16 MXU inputs put a ~1e-3 floor under residuals — see
# core/precision.py).  Opt out with PYSDC_TPU_MATMUL_PRECISION=keep.
configure_default_matmul_precision()

from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.parallel.sharded import ShardedController
from pysdc_tpu.parallel.paradiag import ParaDiagController
from pysdc_tpu.parallel.mesh import make_mesh
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.sweepers.explicit import ExplicitSweeper
from pysdc_tpu.sweepers.multi_implicit import MultiImplicitSweeper
from pysdc_tpu.sweepers.linearized import LinearizedImplicitParallel
from pysdc_tpu.utils.stats import filter_stats, get_list_of_types, get_sorted, sort_stats

__version__ = '0.1.0'

__all__ = [
    'ControllerNonMPI',
    'ShardedController',
    'ParaDiagController',
    'make_mesh',
    'GenericImplicit',
    'IMEXSweeper',
    'ExplicitSweeper',
    'MultiImplicitSweeper',
    'LinearizedImplicitParallel',
    'filter_stats',
    'sort_stats',
    'get_sorted',
    'get_list_of_types',
]
