"""LogToPickleFile, PlotPostStep, LogExtrapolationErrorEstimate hooks
(reference log_solution.py:73-130, plotting.py, log_extrapolated_error_estimate.py)."""

import glob
import os
import pickle

import numpy as np

from pysdc_tpu.convergence.estimate_extrapolation_error import EstimateExtrapolationErrorNonMPI
from pysdc_tpu.hooks.logging_hooks import (
    LogExtrapolationErrorEstimate,
    LogToPickleFile,
    PlotPostStep,
)
from pysdc_tpu.models.heat import HeatNDForced
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.stats import get_sorted


def _desc(**extra):
    d = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nvars=32, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.1, restol=1e-10),
        step_params=dict(maxiter=20),
    )
    d.update(extra)
    return d


def test_log_to_pickle_file(tmp_path):
    LogToPickleFile.path = str(tmp_path)
    LogToPickleFile.file_name = 'sol'
    try:
        c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': [LogToPickleFile]}, _desc())
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
        files = sorted(glob.glob(os.path.join(str(tmp_path), 'sol_*.pickle')))
        assert len(files) == 5, files
        with open(files[-1], 'rb') as fh:
            data = pickle.load(fh)
        assert abs(data['t'] - 0.5) < 1e-12
        np.testing.assert_allclose(data['u'], np.asarray(uend), rtol=1e-12)
    finally:
        LogToPickleFile.path = None
        LogToPickleFile.file_name = 'solution'


def test_plot_post_step(tmp_path):
    PlotPostStep.save_plot = str(tmp_path / 'heat')
    PlotPostStep.plot_every = 2
    try:
        c = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': [PlotPostStep]}, _desc())
        P = c.MS[0].levels[0].prob
        c.run(P.u_exact(0.0), 0.0, 0.4)
        pngs = sorted(glob.glob(str(tmp_path / 'heat_*.png')))
        assert len(pngs) == 2, pngs  # 4 steps, every 2nd plotted
        assert all(os.path.getsize(p) > 0 for p in pngs)
    finally:
        PlotPostStep.save_plot = None
        PlotPostStep.plot_every = 1


def test_log_extrapolation_error_estimate():
    desc = _desc(
        convergence_controllers={EstimateExtrapolationErrorNonMPI: {'no_storage': False}},
        level_params=dict(dt=0.1, restol=-1),
        step_params=dict(maxiter=5),
    )
    c = ControllerNonMPI(
        4, {'logger_level': 40, 'hook_class': [LogExtrapolationErrorEstimate]}, desc
    )
    P = c.MS[0].levels[0].prob
    _, stats = c.run(P.u_exact(0.0), 0.0, 1.0)
    ests = [v for _, v in get_sorted(stats, type='error_extrapolation_estimate')]
    assert len(ests) > 0
    assert all(np.isfinite(e) and e >= 0 for e in ests)


def test_device_timings_hook():
    """DeviceTimings (GPUTimings analog, reference log_timings.py:328-340):
    per-stage entries exist, are positive, and nest consistently —
    sum(timing_step) <= timing_run, sum(timing_sweep per step) <=
    timing_step — with forced device syncs bounding real execution."""
    from pysdc_tpu.core.hooks import DeviceTimings

    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=2, nvars=32, bc='periodic'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(2, {'logger_level': 40, 'hook_class': DeviceTimings}, desc)
    P = c.MS[0].levels[0].prob
    _, stats = c.run(P.u_exact(0.0), 0.0, 0.2)

    runs = [v for _, v in get_sorted(stats, type='timing_run')]
    steps = [v for _, v in get_sorted(stats, type='timing_step')]
    sweeps = [v for _, v in get_sorted(stats, type='timing_sweep')]
    iters = [v for _, v in get_sorted(stats, type='timing_iteration')]
    assert runs and steps and sweeps and iters
    # individual entries may be below clock resolution; totals must be real
    assert all(v >= 0 for v in runs + steps + sweeps + iters)
    assert sum(runs) > 0 and sum(steps) > 0 and sum(sweeps) > 0
    # stage nesting: each step interval is contained in the run interval
    # (virtual-parallel step timers OVERLAP in wall-clock, so sums across
    # slots double-count — compare maxima, as the entries are intervals)
    assert max(steps) <= max(runs) * 1.05
    assert max(sweeps) <= max(runs) * 1.05
