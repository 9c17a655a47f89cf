"""The five BASELINE.json configurations, end to end.

1. 1D forced heat, implicit SDC, LU, 5 Radau nodes
2. 1D advection-diffusion IMEX SDC (periodic, split operators)
3. 2D Allen-Cahn, semi-implicit SDC, sharded across chips (space axis)
4. 2D Gray-Scott, MLSDC two-level with spectrally-coarsened operators
5. 3D heat under PFASST with time parallelism on the device mesh
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.advdiff import AdvectionDiffusion1D
from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicSemiImplicitND
from pysdc_tpu.models.gray_scott import GrayScott
from pysdc_tpu.models.heat import HeatND, HeatNDForced
from pysdc_tpu.parallel.mesh import make_mesh
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.parallel.sharded import ShardedController
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.transfer.space_fft import FFTTransfer
from pysdc_tpu.utils.stats import get_sorted


def test_config1_heat1d_forced_implicit_lu_5radau():
    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=4, nvars=1023, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=5, QI='LU'),
        level_params=dict(restol=1e-10, dt=0.1),
        step_params=dict(maxiter=25),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.1), 0.1, 0.3)
    err = float(jnp.max(jnp.abs(P.u_exact(0.3) - uend)))
    assert err <= 2e-5
    assert all(v < 25 for _, v in get_sorted(stats, type='niter'))


def test_config2_advection_diffusion_imex():
    desc = dict(
        problem_class=AdvectionDiffusion1D,
        problem_params=dict(nvars=256, c=1.0, nu=0.02, freq=2),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU', QE='EE'),
        level_params=dict(dt=0.01, restol=1e-11),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.5))))
    assert err < 1e-7, err


def test_config3_allen_cahn_2d_sharded_space():
    """Semi-implicit 2D AC with the spatial axis sharded across chips."""
    desc = dict(
        problem_class=AllenCahnPeriodicSemiImplicitND,
        problem_params=dict(nvars=(64, 64), eps=0.08, radius=0.25),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=1e-3, restol=1e-9),
        step_params=dict(maxiter=20),
    )
    ref = ControllerNonMPI(2, {'logger_level': 40}, desc)
    P = ref.MS[0].levels[0].prob
    u_ref, s_ref = ref.run(P.u_exact(0.0), 0.0, 4e-3)
    it_ref = [v for _, v in get_sorted(s_ref, type='niter')]

    mesh = make_mesh(n_time=2, n_space=4)
    sh = ShardedController(2, {'logger_level': 40}, desc, mesh=mesh)
    u_sh, s_sh = sh.run(P.u_exact(0.0), 0.0, 4e-3, lane='stage')
    it_sh = [v for _, v in get_sorted(s_sh, type='niter')]

    assert it_ref == it_sh, (it_ref, it_sh)
    assert float(jnp.max(jnp.abs(u_ref - u_sh))) < 1e-10
    assert len(sh.blocks[0].state.u.sharding.device_set) == 8


def test_config4_gray_scott_mlsdc_fft_coarse():
    """Two-level MLSDC with FFT-truncated coarse operators must converge in
    no more iterations than single-level SDC."""
    iters = {}
    for label, nvars in (('ml', [(64, 64), (32, 32)]), ('sl', (64, 64))):
        desc = dict(
            problem_class=GrayScott,
            problem_params=dict(nvars=nvars, Du=1e-4, Dv=1e-5, A=0.04, B=0.1, L=2.0),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(num_nodes=[3], QI='LU'),
            level_params=dict(dt=1.0, restol=1e-10),
            step_params=dict(maxiter=30),
            space_transfer_class=FFTTransfer,
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, stats = c.run(P.u_exact(0.0), 0.0, 3.0)
        iters[label] = [v for _, v in get_sorted(stats, type='niter')]
        assert bool(jnp.isfinite(uend).all())
    assert sum(iters['ml']) <= sum(iters['sl']), iters


def test_config5_heat3d_pfasst_sharded_time():
    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=[(16, 16, 16), (8, 8, 8)], nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=[3], QI='LU'),
        level_params=dict(dt=0.05, restol=1e-9),
        step_params=dict(maxiter=20),
        space_transfer_params=dict(rorder=2, iorder=2, periodic=True),
    )
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}

    ref = ControllerNonMPI(4, cp, desc)
    P = ref.MS[0].levels[0].prob
    u_ref, s_ref = ref.run(P.u_exact(0.0), 0.0, 0.4)
    it_ref = [v for _, v in get_sorted(s_ref, type='niter')]

    mesh = make_mesh(n_time=4, n_space=2)
    sh = ShardedController(4, cp, desc, mesh=mesh)
    u_sh, s_sh = sh.run(P.u_exact(0.0), 0.0, 0.4, lane='stage')
    it_sh = [v for _, v in get_sorted(s_sh, type='niter')]

    assert it_ref == it_sh, (it_ref, it_sh)
    err = float(jnp.max(jnp.abs(u_ref - P.u_exact(0.4))))
    assert err < 1e-4, err
    assert float(jnp.max(jnp.abs(u_ref - u_sh))) < 1e-11
