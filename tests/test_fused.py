"""Fused device-resident block runner vs the stage-machine controllers.

The fused path (parallel/fused.py) compiles the whole PFASST block solve —
predictor plus iterate-until-converged loop — into one XLA program.  These
tests pin it entry-for-entry against the slow sharded path and the virtual
controller: identical iteration counts and matching uend (the reference's
controller-equivalence invariant, tests/test_tutorials/test_step_6.py:26-42).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.core.errors import ControllerError
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.parallel.mesh import make_mesh
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.parallel.sharded import ShardedController
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.utils.stats import get_sorted


def _desc(nvars, **level_overrides):
    level_params = dict(restol=5e-10, dt=0.125)
    level_params.update(level_overrides)
    return dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=nvars, bc='dirichlet-zero'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=level_params,
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=6),
    )


def _run_pair(num_procs, cp, desc, Tend=1.0, mesh=None):
    """Run the virtual controller and the fused sharded path on one config."""
    ref = ControllerNonMPI(num_procs, cp, desc)
    P = ref.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    u_ref, s_ref = ref.run(u0, 0.0, Tend)

    sh = ShardedController(num_procs, cp, desc, mesh=mesh)
    u_fu, s_fu = sh.run_fused(u0, 0.0, Tend)
    return (u_ref, s_ref), (u_fu, s_fu)


def _niters(stats):
    return [(round(t, 10), int(v)) for t, v in get_sorted(stats, type='niter')]


@pytest.mark.parametrize('num_procs', [2, 4])
def test_fused_matches_virtual_pfasst(num_procs):
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(num_procs, cp, _desc([63, 31]))
    assert _niters(s_ref) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-11


def test_fused_matches_slow_sharded_on_mesh():
    """Fused vs slow sharded path on the real 8-device emulated mesh."""
    desc = _desc([63, 31])
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    mesh = make_mesh(n_time=4, n_space=1)

    sh = ShardedController(4, cp, desc, mesh=mesh)
    P = sh.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    u_slow, s_slow = sh.run(u0, 0.0, 1.0)
    u_fu, s_fu = sh.run_fused(u0, 0.0, 1.0)

    assert _niters(s_slow) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_slow - u_fu))) < 1e-11
    # residual trajectories agree at every recorded iteration
    r_slow = {(round(e.time, 10), e.iter): v for e, v in s_slow.items() if e.type == 'residual_post_iteration'}
    r_fu = {(round(e.time, 10), e.iter): v for e, v in s_fu.items() if e.type == 'residual_post_iteration'}
    assert set(r_slow) == set(r_fu)
    for key in r_slow:
        assert np.isclose(r_slow[key], r_fu[key], rtol=1e-6, atol=1e-13), key


def test_fused_single_level_jacobi_mssdc():
    desc = _desc(63)
    cp = {'logger_level': 40}  # mssdc_jac defaults True
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(4, cp, desc)
    assert _niters(s_ref) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-11


def test_fused_single_level_gauss_seidel_mssdc():
    desc = _desc(63)
    cp = {'logger_level': 40, 'mssdc_jac': False}
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(4, cp, desc)
    assert _niters(s_ref) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-11


def test_fused_all_to_done():
    desc = _desc([63, 31])
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin', 'all_to_done': True}
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(4, cp, desc)
    assert _niters(s_ref) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-11


def test_fused_fine_only_predictor():
    desc = _desc([63, 31])
    cp = {'logger_level': 40, 'predict_type': 'fine_only'}
    mesh = make_mesh(n_time=4, n_space=1)
    sh = ShardedController(4, cp, desc, mesh=mesh)
    P = sh.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    u_slow, s_slow = sh.run(u0, 0.0, 1.0)
    u_fu, s_fu = sh.run_fused(u0, 0.0, 1.0)
    assert _niters(s_slow) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_slow - u_fu))) < 1e-11


def test_fused_fmg_predictor():
    desc = _desc([63, 31])
    cp = {'logger_level': 40, 'predict_type': 'fmg'}
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(4, cp, desc)
    assert _niters(s_ref) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-11


def test_fused_partial_final_block():
    """Tend not a multiple of P*dt: the last block runs a prefix window."""
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(4, cp, _desc([63, 31]), Tend=0.75)
    assert _niters(s_ref) == _niters(s_fu)
    assert len(_niters(s_fu)) == 6  # 4 + 2 steps
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-11


def test_fused_maxiter_termination():
    """Unreachable restol: every step must stop at maxiter (converged False)."""
    desc = _desc([63, 31], restol=1e-30)
    desc['step_params'] = dict(maxiter=3)
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    (u_ref, s_ref), (u_fu, s_fu) = _run_pair(4, cp, desc, Tend=0.5)
    assert _niters(s_ref) == _niters(s_fu)
    assert all(v == 3 for _, v in _niters(s_fu))


def test_fused_imex_problem():
    """IMEX split RHS (pytree f) through the fused loop."""
    from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicSemiImplicitND
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    desc = dict(
        problem_class=AllenCahnPeriodicSemiImplicitND,
        problem_params=dict(nvars=[(32, 32), (16, 16)], eps=0.2, radius=0.25),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU', QE='EE'),
        level_params=dict(restol=1e-9, dt=1e-3),
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=6, periodic=True),
    )
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    ref = ControllerNonMPI(4, cp, desc)
    P = ref.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    u_ref, s_ref = ref.run(u0, 0.0, 4e-3)
    sh = ShardedController(4, cp, desc)
    u_fu, s_fu = sh.run_fused(u0, 0.0, 4e-3)
    assert _niters(s_ref) == _niters(s_fu)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-10


def test_fused_rejects_hotrod():
    """Policies outside the adaptive stack still force the stage machine."""
    from pysdc_tpu.convergence.hotrod import HotRod

    desc = _desc([63, 31], restol=-1.0)
    desc['convergence_controllers'] = {HotRod: {'HotRod_tol': 1e-3}}
    desc['step_params'] = dict(maxiter=5)
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    sh = ShardedController(4, cp, desc)
    with pytest.raises(ControllerError, match='stage-machine'):
        sh.run_fused(sh.MS[0].levels[0].prob.u_exact(0.0), 0.0, 1.0)


def test_fused_rejects_custom_hooks():
    """Hooks needing per-sweep data (LogWork) force the stage machine rather
    than silently returning empty stats (round-3 advisor finding)."""
    from pysdc_tpu.hooks.logging_hooks import LogWork

    desc = _desc([63, 31])
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin', 'hook_class': [LogWork]}
    sh = ShardedController(4, cp, desc)
    with pytest.raises(ControllerError, match='LogWork'):
        sh.run_fused(sh.MS[0].levels[0].prob.u_exact(0.0), 0.0, 1.0)
    # the single run() entry point transparently falls back
    u0 = sh.MS[0].levels[0].prob.u_exact(0.0)
    _, stats = sh.run(u0, 0.0, 0.5)
    assert [v for k, v in stats.items() if k.type == 'lane'] == ['stage']


def _lane_of(stats):
    return [v for k, v in stats.items() if k.type == 'lane']


def test_run_autodispatch_lanes():
    """Default run() picks the fused lane for eligible configs, the adaptive
    fused lane for the adaptivity stack, and the stage machine otherwise
    (one run() like the reference, controller_nonMPI.py:85).  Tiny VdP
    configs — the point is the lane routing, not the numerics."""
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.odes import VanDerPol

    def vdp_desc(cc=None):
        cc = cc or {}
        return dict(
            problem_class=VanDerPol,
            problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
            sweeper_class=GenericImplicit,
            sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
            level_params=dict(restol=-1.0 if cc else 1e-8, dt=1e-2),
            step_params=dict(maxiter=4),
            convergence_controllers=dict(cc),
        )

    Tend = 3e-2
    desc = vdp_desc()
    sh = ShardedController(2, {'logger_level': 40}, desc)
    u0 = sh.MS[0].levels[0].prob.u_exact(0.0)
    _, stats = sh.run(u0, 0.0, Tend)
    assert _lane_of(stats) == ['fused']

    sh_ad = ShardedController(2, {'logger_level': 40}, vdp_desc({Adaptivity: {'e_tol': 1e-6}}))
    _, stats_ad = sh_ad.run(u0, 0.0, Tend)
    assert _lane_of(stats_ad) == ['fused_adaptive']

    # the linearized estimator flavor rides the adaptive lane too (its
    # chain differencing is host arithmetic on the fetched raw estimates)
    sh_lin = ShardedController(
        2, {'logger_level': 40},
        vdp_desc({Adaptivity: {'e_tol': 1e-6, 'embedded_error_flavor': 'linearized'}}),
    )
    _, stats_lin = sh_lin.run(u0, 0.0, Tend)
    assert _lane_of(stats_lin) == ['fused_adaptive']

    from pysdc_tpu.convergence.adaptivity import AdaptivityResidual

    sh_res = ShardedController(
        2, {'logger_level': 40}, vdp_desc({AdaptivityResidual: {'e_tol': 1e3, 'max_restol': 1e-11}})
    )
    _, stats_res = sh_res.run(u0, 0.0, Tend)
    assert _lane_of(stats_res) == ['stage']


def _adaptive_parity(desc, cp, num_procs, Tend, dt_rtol=1e-6):
    """Gate the adaptive fused lane against the stage-machine oracle:
    identical iteration counts and restart patterns, matching dts and
    embedded-error stats entries (values to float noise — adaptive dt
    choices amplify last-bit XLA fusion differences over many steps)."""
    ref = ControllerNonMPI(num_procs, cp, desc)
    P = ref.MS[0].levels[0].prob
    u_ref, s_ref = ref.run(P.u_exact(0.0), 0.0, Tend)
    sh = ShardedController(num_procs, cp, desc)
    u_fu, s_fu = sh.run(P.u_exact(0.0), 0.0, Tend)
    assert _lane_of(s_fu) == ['fused_adaptive']

    for kind in ('niter', 'restart'):
        a = get_sorted(s_ref, type=kind, recomputed=None)
        b = get_sorted(s_fu, type=kind, recomputed=None)
        assert [v for _, v in a] == [v for _, v in b], kind
    for kind in ('dt', 'error_embedded_estimate', 'residual_post_iteration',
                 'residual_post_step', 'error_embedded_estimate_post_step'):
        a = get_sorted(s_ref, type=kind, recomputed=None)
        b = get_sorted(s_fu, type=kind, recomputed=None)
        assert len(a) == len(b), kind
        for (t1, v1), (t2, v2) in zip(a, b):
            assert abs(t1 - t2) < 1e-9, (kind, t1, t2)
            assert np.isclose(v1, v2, rtol=dt_rtol, atol=1e-11), (kind, t1, v1, v2)
    return u_ref, u_fu


def test_fused_adaptive_van_der_pol_single_step():
    """Embedded-error adaptivity with restarts on the device-resident lane,
    P=1 (serial adaptive SDC) — the reference's production mode
    (adaptivity.py:80-97 + basic_restarting.py:134)."""
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.odes import VanDerPol

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=-1.0, dt=1e-2),
        step_params=dict(maxiter=4),
        convergence_controllers={Adaptivity: {'e_tol': 1e-7}},
    )
    u_ref, u_fu = _adaptive_parity(desc, {'logger_level': 40}, 1, 0.25, dt_rtol=1e-7)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-10


def test_fused_adaptive_van_der_pol_block():
    """Blockwise adaptivity (restart cascading + donor dt spreading) through
    the fused lane, P=4 Gauss-Seidel-free MSSDC."""
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.odes import VanDerPol

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=-1.0, dt=2e-2),
        step_params=dict(maxiter=7),
        convergence_controllers={Adaptivity: {'e_tol': 1e-7}},
    )
    u_ref, u_fu = _adaptive_parity(desc, {'logger_level': 40, 'mssdc_jac': True}, 4, 0.24, dt_rtol=1e-7)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-10


def test_fused_adaptive_allen_cahn_pfasst_block():
    """Adaptive multi-level PFASST block (IMEX Allen-Cahn) with a step-size
    limiter: the coarse level keeps its own dt after restarts (the
    reference's per-level spreading, spread_step_sizes.py:133-154)."""
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.allen_cahn import AllenCahnPeriodicSemiImplicitND
    from pysdc_tpu.sweepers.imex import IMEXSweeper

    desc = dict(
        problem_class=AllenCahnPeriodicSemiImplicitND,
        problem_params=dict(nvars=[(32, 32), (16, 16)], eps=0.2, radius=0.25),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU', QE='EE'),
        level_params=dict(restol=-1.0, dt=1e-3),
        step_params=dict(maxiter=4),
        space_transfer_params=dict(rorder=2, iorder=6, periodic=True),
        convergence_controllers={Adaptivity: {'e_tol': 1e-7, 'dt_max': 5e-3, 'dt_min': 1e-5}},
    )
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    u_ref, u_fu = _adaptive_parity(desc, cp, 4, 4e-3, dt_rtol=1e-5)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-8


def test_fused_adaptive_linearized_flavor_block():
    """Blockwise MSSDC adaptivity with the LINEARIZED embedded estimator —
    the flavor the reference uses for multi-step blocks — through the
    adaptive fused lane, entry-for-entry against the stage machine."""
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.odes import VanDerPol

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=-1.0, dt=1e-2),
        step_params=dict(maxiter=7),
        convergence_controllers={Adaptivity: {'e_tol': 1e-7, 'embedded_error_flavor': 'linearized'}},
    )
    u_ref, u_fu = _adaptive_parity(desc, {'logger_level': 40, 'mssdc_jac': True}, 4, 0.25, dt_rtol=1e-7)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-10


def test_fused_adaptive_rk_cash_karp():
    """Embedded-RK adaptivity (AdaptivityRK + Cash-Karp pair) through the
    adaptive fused lane: the estimator reads the secondary end point off
    the synced shadow state at the final check (reference adaptivity.py:422)."""
    from pysdc_tpu.convergence.adaptivity import AdaptivityRK
    from pysdc_tpu.models.odes import VanDerPol
    from pysdc_tpu.sweepers.runge_kutta import Cash_Karp

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=Cash_Karp,
        sweeper_params={},
        level_params=dict(dt=1e-2, restol=-1),
        step_params=dict(maxiter=1),
        convergence_controllers={AdaptivityRK: {'e_tol': 1e-7, 'update_order': 5}},
    )
    u_ref, u_fu = _adaptive_parity(desc, {'logger_level': 40}, 1, 0.5, dt_rtol=1e-7)
    assert float(jnp.max(jnp.abs(u_ref - u_fu))) < 1e-10


def test_fused_adaptive_on_device_mesh():
    """The adaptive fused lane under a REAL (emulated 8-device) time mesh:
    sharding the block over devices must not change the adaptive
    trajectory — same lane, same iteration counts, same restart pattern
    and matching accepted dts as the meshless adaptive run."""
    from pysdc_tpu.convergence.adaptivity import Adaptivity
    from pysdc_tpu.models.odes import VanDerPol

    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=-1.0, dt=1e-2),
        step_params=dict(maxiter=4),
        # e_tol 1e-6 / Tend 0.03: the original (1e-7, 0.12) marched so many
        # tiny adaptive blocks that the two runs took > 20 min EACH on a
        # 2-core host — same parity semantics, ~10x fewer blocks
        convergence_controllers={Adaptivity: {'e_tol': 1e-6}},
    )
    cp = {'logger_level': 40}
    Tend = 0.03

    virt = ShardedController(4, cp, desc)
    P = virt.MS[0].levels[0].prob
    u_virt, s_virt = virt.run(P.u_exact(0.0), 0.0, Tend)
    assert _lane_of(s_virt) == ['fused_adaptive']

    mesh = make_mesh(n_time=4, n_space=1)
    sh = ShardedController(4, cp, desc, mesh=mesh)
    u_mesh, s_mesh = sh.run(P.u_exact(0.0), 0.0, Tend)
    assert _lane_of(s_mesh) == ['fused_adaptive']

    for kind in ('niter', 'restart'):
        a = [v for _, v in get_sorted(s_virt, type=kind, recomputed=None)]
        b = [v for _, v in get_sorted(s_mesh, type=kind, recomputed=None)]
        assert a == b, kind
    a = get_sorted(s_virt, type='dt', recomputed=None)
    b = get_sorted(s_mesh, type='dt', recomputed=None)
    assert len(a) == len(b)
    for (t1, v1), (t2, v2) in zip(a, b):
        assert abs(t1 - t2) < 1e-9 and np.isclose(v1, v2, rtol=1e-7, atol=1e-12)
    assert float(jnp.max(jnp.abs(u_virt - u_mesh))) < 1e-9


def test_lane_stats_contract():
    """The per-lane stats contract documented in README: each lane emits
    exactly the documented entry-type set under the default hook stack."""
    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[(32, 32), (16, 16)], bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=20),
        space_transfer_params=dict(rorder=2, iorder=2, periodic=True),
    )
    cp = {'logger_level': 40, 'predict_type': 'pfasst_burnin'}
    base = {'dt', 'lane', 'niter', 'residual_post_iteration', 'residual_post_step', 'restart'}
    timings = {'timing_run', 'timing_step', 'timing_iteration'}
    expected = {
        'stage': base | timings | {'timing_sweep', 'residual_post_sweep'},
        'fused': base,
    }
    for lane, want in expected.items():
        c = ShardedController(2, cp, desc)
        u0 = c.MS[0].levels[0].prob.u_exact(0.0)
        _, stats = c.run(u0, 0.0, 0.2, lane=lane)
        got = {k.type for k in stats}
        assert got == want, f'{lane}: {sorted(got ^ want)}'

    from pysdc_tpu.convergence.adaptivity import Adaptivity

    desc_a = dict(desc, level_params=dict(restol=-1.0, dt=0.05), step_params=dict(maxiter=4),
                  convergence_controllers={Adaptivity: {'e_tol': 1e-6}})
    emb = {'error_embedded_estimate', 'error_embedded_estimate_post_step'}
    expected_a = {
        'stage': base | timings | {'timing_sweep', 'residual_post_sweep'} | emb,
        'fused_adaptive': base | timings | emb,
    }
    for lane, want in expected_a.items():
        c = ShardedController(2, cp, desc_a)
        u0 = c.MS[0].levels[0].prob.u_exact(0.0)
        _, stats = c.run(u0, 0.0, 0.2, lane=lane)
        got = {k.type for k in stats}
        assert got == want, f'adaptive-{lane}: {sorted(got ^ want)}'
