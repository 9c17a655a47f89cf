"""Incompressible NSE (vorticity-streamfunction) tests — the analog of the
reference's StroemungsRaum incompressible-NSE capability."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.navier_stokes import NavierStokesVorticity2D
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.imex import IMEXSweeper


def _desc(dt, nvars=(64, 64), nu=1e-2, maxiter=30, restol=1e-11):
    return dict(
        problem_class=NavierStokesVorticity2D,
        problem_params=dict(nvars=nvars, nu=nu),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU', QE='EE'),
        level_params=dict(dt=dt, restol=restol),
        step_params=dict(maxiter=maxiter),
    )


def test_taylor_green_advection_vanishes():
    """TG vortices: u . grad(w) = 0 identically, so the explicit part must
    be zero to spectral accuracy while diffusion matches -2 nu k^2 w."""
    P = NavierStokesVorticity2D(nvars=(64, 64), nu=1e-2)
    w0 = P.u_exact(0.0)
    f = P.eval_f(w0, 0.0)
    assert float(jnp.max(jnp.abs(f.expl))) < 1e-10
    k = 2 * np.pi / P.L
    assert float(jnp.max(jnp.abs(f.impl + 2 * P.nu * k**2 * w0))) < 1e-9


def test_taylor_green_exact_decay_via_sdc():
    c = ControllerNonMPI(1, {'logger_level': 40}, _desc(0.05))
    P = c.MS[0].levels[0].prob
    uend, _ = c.run(P.u_exact(0.0), 0.0, 0.5)
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.5))))
    assert err < 1e-9, err


def test_turbulent_decay_properties():
    """Random multi-mode IC: 2D NSE conserves energy better than enstrophy
    (inverse cascade); both must decay; flow stays divergence-free."""
    c = ControllerNonMPI(1, {'logger_level': 40}, _desc(0.02, nu=5e-3, maxiter=8, restol=1e-9))
    P = c.MS[0].levels[0].prob
    w0 = P.u_exact(0.0, kind='random')
    E0, Z0 = P.kinetic_energy(w0), P.enstrophy(w0)
    uend, _ = c.run(w0, 0.0, 0.5)
    E1, Z1 = P.kinetic_energy(uend), P.enstrophy(uend)
    assert np.isfinite(E1) and np.isfinite(Z1)
    assert E1 < E0 and Z1 < Z0, (E0, E1, Z0, Z1)
    assert (Z0 - Z1) / Z0 > (E0 - E1) / E0, 'enstrophy should decay faster than energy in 2D'
    assert P.divergence(uend) < 1e-8


def test_self_convergence_order_in_dt():
    """Nonlinear self-convergence: halving dt with a 3-node RADAU-RIGHT
    collocation (order 5) must shrink the error by >= 2^4."""
    P = NavierStokesVorticity2D(nvars=(48, 48), nu=5e-3)
    w0 = P.u_exact(0.0, kind='random')

    def run(dt, maxiter):
        c = ControllerNonMPI(1, {'logger_level': 40},
                             _desc(dt, nvars=(48, 48), nu=5e-3, maxiter=maxiter, restol=1e-13))
        u, _ = c.run(w0, 0.0, 0.24)
        return u

    ref = run(0.005, 40)
    e1 = float(jnp.max(jnp.abs(run(0.04, 40) - ref)))
    e2 = float(jnp.max(jnp.abs(run(0.02, 40) - ref)))
    assert e1 / e2 > 2**4, (e1, e2, e1 / e2)


def test_energy_spectrum_shape():
    P = NavierStokesVorticity2D(nvars=(64, 64), nu=1e-2, k_tg=2)
    w = P.u_exact(0.0)  # single shell k = 2*sqrt(2)*... energy concentrated
    k, E = P.energy_spectrum(w)
    assert E.sum() > 0
    # TG at k_tg=2 puts all energy in the |k| = 2*sqrt(2) shell -> bin 3
    assert np.argmax(E) == 3
