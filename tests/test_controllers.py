"""End-to-end controller tests: SDC, MLSDC, MSSDC, PFASST.

Mirrors the reference's tutorial-as-golden-test strategy
(``pySDC/tests/test_tutorials``): accuracy gates from tutorial step 2
(single-level IMEX SDC) and iteration-count gates from tutorial step 6
(PFASST with 1..8 virtual processes, all counts <= 8).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.heat import HeatND, HeatNDForced
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.stats import get_sorted


def test_sdc_heat_imex_tutorial_step2_gate():
    """Reference tutorial/step_2/C_using_pySDCs_frontend.py: err <= 2e-5."""
    description = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=4, nvars=1023, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3),
        level_params=dict(restol=1e-10, dt=0.1),
        step_params=dict(maxiter=20),
    )
    controller = ControllerNonMPI(1, {'logger_level': 40}, description)
    P = controller.MS[0].levels[0].prob
    uend, stats = controller.run(P.u_exact(0.1), 0.1, 0.3)
    err = float(jnp.max(jnp.abs(P.u_exact(0.3) - uend)))
    assert err <= 2e-5, err
    iters = [v for _, v in get_sorted(stats, type='niter')]
    assert len(iters) == 2
    assert all(i < 20 for i in iters), f'residual tolerance not reached, {iters}'


def _step6_description():
    """Reference tutorial/step_6/A_run_non_MPI_controller.py:set_parameters_ml."""
    return dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[63, 31], bc='dirichlet-zero'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=5e-10, dt=0.125),
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=6),
    )


@pytest.mark.parametrize('num_procs', [1, 2, 4, 8])
def test_pfasst_tutorial_step6_iteration_counts(num_procs):
    controller = ControllerNonMPI(
        num_procs,
        {'logger_level': 40, 'all_to_done': True, 'predict_type': 'pfasst_burnin'},
        _step6_description(),
    )
    P = controller.MS[0].levels[0].prob
    uend, stats = controller.run(P.u_exact(0.0), 0.0, 1.0)
    err = float(jnp.max(jnp.abs(P.u_exact(1.0) - uend)))
    iter_counts = get_sorted(stats, type='niter', sortby='time')
    assert len(iter_counts) == 8
    assert all(item[1] <= 8 for item in iter_counts), f'weird iteration counts, got {iter_counts}'
    assert err < 2e-5, err


def test_pfasst_residuals_decrease_and_equivalence_across_block_sizes():
    """Same total interval split over different virtual-parallel widths must
    give consistent solutions."""
    sols = {}
    for num_procs in (1, 4):
        controller = ControllerNonMPI(
            num_procs,
            {'logger_level': 40, 'predict_type': 'pfasst_burnin'},
            _step6_description(),
        )
        P = controller.MS[0].levels[0].prob
        uend, _ = controller.run(P.u_exact(0.0), 0.0, 0.5)
        sols[num_procs] = np.asarray(uend)
    assert np.max(np.abs(sols[1] - sols[4])) < 1e-7


def test_mssdc_matches_serial_sdc():
    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=64, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-10, dt=0.05),
        step_params=dict(maxiter=30),
    )
    runs = {}
    for label, num_procs, jac in (('serial', 1, True), ('gs', 4, False), ('jac', 4, True)):
        c = ControllerNonMPI(num_procs, {'logger_level': 40, 'mssdc_jac': jac}, desc)
        P = c.MS[0].levels[0].prob
        uend, stats = c.run(P.u_exact(0.0), 0.0, 0.2)
        runs[label] = np.asarray(uend)
    assert np.max(np.abs(runs['serial'] - runs['gs'])) < 1e-9
    assert np.max(np.abs(runs['serial'] - runs['jac'])) < 1e-9


def test_mlsdc_converges_faster_than_sdc():
    """Two-level MLSDC should need no more iterations than single-level SDC."""
    base = _step6_description()
    sl = dict(base)
    sl['problem_params'] = dict(nu=0.1, freq=2, nvars=63, bc='dirichlet-zero')
    sl['sweeper_params'] = dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU')

    iters = {}
    for label, desc in (('ml', base), ('sl', sl)):
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        _, stats = c.run(P.u_exact(0.0), 0.0, 0.25)
        iters[label] = [v for _, v in get_sorted(stats, type='niter')]
    assert sum(iters['ml']) <= sum(iters['sl']), iters
