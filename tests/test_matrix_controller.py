"""Matrix-based PFASST controller: parity with the step-based controller and
propagation-matrix consistency (reference projects/matrixPFASST)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.core.errors import ControllerError
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.parallel.matrix_controller import ControllerMatrixNonMPI
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.stats import get_sorted


def _desc(**over):
    d = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=[63, 31], nu=0.1, freq=4, bc='dirichlet-zero'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU', initial_guess='spread'),
        level_params=dict(restol=1e-8, dt=0.25),
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=2),
    )
    d.update(over)
    return d


CP = {'logger_level': 40, 'all_to_done': True, 'mssdc_jac': True}


def test_matrix_pfasst_matches_step_controller():
    desc = _desc()
    cm = ControllerMatrixNonMPI(4, CP, desc)
    P = cm.MS[0].levels[0].prob
    um, sm = cm.run(P.u_exact(0.0), 0.0, 1.0)
    cs = ControllerNonMPI(4, CP, desc)
    us, ss = cs.run(P.u_exact(0.0), 0.0, 1.0)
    assert [v for _, v in get_sorted(sm, type='niter')] == [v for _, v in get_sorted(ss, type='niter')]
    assert float(jnp.max(jnp.abs(um - us))) < 1e-12
    assert float(jnp.max(jnp.abs(um - P.u_exact(1.0)))) < 1e-5


def test_matrix_sdc_single_level_single_step():
    desc = _desc(problem_params=dict(nvars=63, nu=0.1, freq=4, bc='dirichlet-zero'))
    cm = ControllerMatrixNonMPI(1, CP, desc)
    P = cm.MS[0].levels[0].prob
    um, _ = cm.run(P.u_exact(0.0), 0.0, 1.0)
    cs = ControllerNonMPI(1, CP, desc)
    us, _ = cs.run(P.u_exact(0.0), 0.0, 1.0)
    assert float(jnp.max(jnp.abs(um - us))) < 1e-12


def test_propagation_matrix_reproduces_run():
    """For a fixed iteration count the propagation matrix applied to u0 must
    equal the controller's one-block result."""
    desc = _desc(level_params=dict(restol=-1, dt=0.25), step_params=dict(maxiter=5))
    cm = ControllerMatrixNonMPI(4, CP, desc)
    P = cm.MS[0].levels[0].prob
    uend, stats = cm.run(P.u_exact(0.0), 0.0, 1.0)
    niters = [v for _, v in get_sorted(stats, type='niter')]
    assert niters == [5, 5, 5, 5]
    mat = cm.build_propagation_matrix(niter=5)
    u_mat = mat @ np.asarray(P.u_exact(0.0)).ravel()
    assert np.abs(u_mat - np.asarray(uend).ravel()).max() < 1e-12


def test_matrix_controller_rejects_wrong_sweeper():
    with pytest.raises(ControllerError):
        ControllerMatrixNonMPI(2, CP, _desc(sweeper_class=IMEXSweeper))
