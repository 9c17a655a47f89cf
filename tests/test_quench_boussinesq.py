"""Quench (magnet runaway heating) and 2D Boussinesq problems."""

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.models.boussinesq import Boussinesq2DIMEX, first_derivative_matrix, upwind_taps
from pysdc_tpu.models.quench import Quench, QuenchIMEX
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper


def test_quench_fully_implicit_vs_scipy():
    desc = dict(
        problem_class=Quench,
        problem_params=dict(nvars=128),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=10.0, restol=1e-9),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 100.0)
    ref = P.u_exact(100.0)
    assert float(jnp.max(jnp.abs(uend - ref))) < 1e-7
    assert P.work_counters['newton'].niter > 0


def test_quench_imex_matches_implicit():
    ref = None
    for cls, sw, dt in ((Quench, GenericImplicit, 5.0), (QuenchIMEX, IMEXSweeper, 5.0)):
        desc = dict(
            problem_class=cls,
            problem_params=dict(nvars=128),
            sweeper_class=sw,
            sweeper_params=dict(num_nodes=3, QI='LU'),
            level_params=dict(dt=dt, restol=1e-10),
            step_params=dict(maxiter=25),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 50.0)
        if ref is None:
            ref = uend
        else:
            assert float(jnp.max(jnp.abs(uend - ref))) < 1e-7


def test_quench_leak_variants_run():
    for leak_type, leak_transition in (('exponential', 'step'), ('linear', 'Gaussian')):
        desc = dict(
            problem_class=Quench,
            problem_params=dict(nvars=64, leak_type=leak_type, leak_transition=leak_transition),
            sweeper_class=GenericImplicit,
            sweeper_params=dict(num_nodes=2, QI='LU'),
            level_params=dict(dt=10.0, restol=1e-8),
            step_params=dict(maxiter=15),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 30.0)
        assert bool(jnp.isfinite(uend).all())
        assert float(uend.max()) > 0


def test_boussinesq_operator_and_solve_parity():
    """eval_f and the direct solve against a dense assembly of the reference
    block structure (buildBoussinesq2DMatrix.py:27-50)."""
    nx, nz = 32, 12
    P = Boussinesq2DIMEX(nvars=(nx, nz))
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(4, nx, nz))

    Dx = first_derivative_matrix(nx, P.dx_, 'periodic', 4)
    I_x, I_z = np.eye(nx), np.eye(nz)
    DX = np.kron(Dx, I_z)
    DZn = np.kron(I_x, P.Az_neu)
    DZd = np.kron(I_x, P.Az_dir)
    Z = np.zeros((nx * nz, nx * nz))
    I = np.eye(nx * nz)
    M = np.block([
        [Z, Z, Z, -DX],
        [Z, Z, I, -DZn],
        [Z, -P.Nfreq**2 * I, Z, Z],
        [-P.c_s**2 * DX, -P.c_s**2 * DZd, Z, Z],
    ])
    qf = np.asarray(q).reshape(4, -1).ravel()

    f_eval = P.eval_f(q, 0.0)
    assert np.abs(M @ qf - np.asarray(f_eval.impl).reshape(4, -1).ravel()).max() < 1e-13

    Dup = np.zeros((nx, nx))
    for off, tap in upwind_taps(5).items():
        for i in range(nx):
            Dup[i, (i + off) % nx] += tap
    Dup /= P.dx_
    ref_expl = -P.u_adv * np.einsum('ij,cjz->ciz', Dup, np.asarray(q))
    assert np.abs(ref_expl - np.asarray(f_eval.expl)).max() < 1e-13

    factor = 0.37
    dense = np.linalg.solve(np.eye(4 * nx * nz) - factor * M, qf)
    mine = np.asarray(P.solve_system(q, factor, q, 0.0)).reshape(4, -1).ravel()
    assert np.abs(dense - mine).max() < 1e-11


def test_boussinesq_imex_sdc_converges():
    sols = {}
    for dt in (6.0, 3.0):
        desc = dict(
            problem_class=Boussinesq2DIMEX,
            problem_params=dict(nvars=(150, 20)),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(num_nodes=3, QI='LU'),
            level_params=dict(dt=dt, restol=1e-11),
            step_params=dict(maxiter=15),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 60.0)
        assert bool(jnp.isfinite(uend).all())
        sols[dt] = np.asarray(uend)
    assert np.abs(sols[6.0] - sols[3.0]).max() < 1e-4
