"""Allen-Cahn spectral variants (reference AllenCahn_2D_FFT.py,
AllenCahn_MPIFFT.py, AllenCahn_Temp_MPIFFT.py): accuracy vs scipy reference,
mass conservation of the time-forcing variant, stabilized-splitting
equivalence, and temperature coupling consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.allen_cahn_spectral import (
    AllenCahn2DSpectral,
    AllenCahn2DSpectralStab,
    AllenCahnSpectralND,
    AllenCahnSpectralTimeForcing,
    AllenCahnTempSpectralND,
)
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.imex import IMEXSweeper


def _run(problem_class, problem_params, dt, Tend, maxiter=30, restol=1e-11):
    desc = dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU', QE='EE'),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, Tend)
    return P, uend, stats


def _imex_rhs(P):
    def rhs(t, u):
        f = P.eval_f(jnp.asarray(u, P.dtype), t)
        return np.asarray(f.impl + f.expl)

    return rhs


def test_allencahn_spectral_nd_vs_scipy():
    P, uend, _ = _run(
        AllenCahnSpectralND,
        dict(nvars=(32, 32), eps=0.08, radius=0.25, dw=-0.02),
        dt=1e-4,
        Tend=4e-4,
    )
    ref = P.generate_scipy_reference_solution(
        _imex_rhs(P), 4e-4, P.u_exact(0.0), 0.0, rtol=1e-10, atol=1e-10
    )
    err = float(jnp.max(jnp.abs(uend - ref)))
    assert err < 1e-7, err


def test_allencahn_timeforcing_conserves_mass():
    P = AllenCahnSpectralTimeForcing(nvars=(32, 32), eps=0.08, radius=0.25)
    u0 = P.u_exact(0.0)
    f = P.eval_f(u0, 0.0)
    # the forcing is built so the total RHS sums to ~0 (AllenCahn_MPIFFT.py:230-259)
    total_rhs = float(jnp.sum(f.impl + f.expl))
    assert abs(total_rhs) < 1e-6 * float(jnp.sum(jnp.abs(f.impl + f.expl)))

    _, uend, _ = _run(
        AllenCahnSpectralTimeForcing,
        dict(nvars=(32, 32), eps=0.08, radius=0.25),
        dt=1e-4,
        Tend=5e-4,
    )
    mass0 = float(jnp.sum(u0))
    mass1 = float(jnp.sum(uend))
    assert abs(mass1 - mass0) / abs(mass0) < 1e-5


def test_allencahn_2d_fft_vs_scipy_and_stab_equivalence():
    params = dict(nvars=(32, 32), nu=2, eps=0.1, radius=0.25)
    P, uend, _ = _run(AllenCahn2DSpectral, params, dt=1e-4, Tend=4e-4)
    ref = P.generate_scipy_reference_solution(
        _imex_rhs(P), 4e-4, P.u_exact(0.0), 0.0, rtol=1e-10, atol=1e-10
    )
    assert float(jnp.max(jnp.abs(uend - ref))) < 1e-7

    # the stabilized splitting integrates the same PDE: solutions must agree
    _, uend_stab, _ = _run(AllenCahn2DSpectralStab, params, dt=1e-4, Tend=4e-4)
    assert float(jnp.max(jnp.abs(uend - uend_stab))) < 1e-7


def test_allencahn_2d_fft_init_types_and_validation():
    for init_type in ('checkerboard', 'random'):
        P = AllenCahn2DSpectral(nvars=(16, 16), init_type=init_type)
        u0 = P.u_exact(0.0)
        assert u0.shape == (16, 16)
        assert bool(jnp.all(jnp.abs(u0) <= 1.0 + 1e-12))
    with pytest.raises(Exception):
        AllenCahn2DSpectral(nvars=(16, 32))
    with pytest.raises(Exception):
        AllenCahn2DSpectral(nvars=(15, 15))


def test_allencahn_circle_rand_initial_condition():
    P = AllenCahnSpectralND(nvars=(24, 24), eps=0.04, L=4.0, init_type='circle_rand')
    u0 = P.u_exact(0.0)
    assert u0.shape == (24, 24)
    assert float(jnp.min(u0)) >= -1e-12 and float(jnp.max(u0)) <= 4.0 * 0.5 + 1.0


def test_allencahn_temp_coupling():
    # with dw=0 the phase field decouples from temperature and matches the
    # plain spectral AC problem
    p = dict(nvars=(24, 24), eps=0.08, radius=0.25)
    P, uend, _ = _run(AllenCahnTempSpectralND, dict(**p, TM=1.0, D=10.0, dw=0.0), dt=1e-4, Tend=3e-4)
    _, uend_plain, _ = _run(AllenCahnSpectralND, dict(**p, dw=0.0), dt=1e-4, Tend=3e-4)
    assert float(jnp.max(jnp.abs(uend[0] - uend_plain))) < 1e-9

    # full coupled system vs scipy reference (latent-heat release: T_t - D Lap T = u_t)
    P2, uend2, _ = _run(
        AllenCahnTempSpectralND,
        dict(nvars=(16, 16), eps=0.1, radius=0.25, TM=1.0, D=2.0, dw=0.3),
        dt=5e-5,
        Tend=2e-4,
    )
    ref = P2.generate_scipy_reference_solution(
        _imex_rhs(P2), 2e-4, P2.u_exact(0.0), 0.0, rtol=1e-10, atol=1e-10
    )
    assert float(jnp.max(jnp.abs(uend2 - ref))) < 1e-7
