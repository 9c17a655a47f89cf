"""Native C++ ionic models vs JAX implementations + monodomain propagation
(mirrors the reference Monodomain project tests, which first compile the C++
and then exercise the models)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.ionic import BiStableJAX, HodgkinHuxleyJAX, NativeIonicModel
from pysdc_tpu.models.monodomain import MonodomainIMEX
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.stats import get_sorted


@pytest.fixture(scope='module')
def rng_states():
    rng = np.random.default_rng(5)
    V = rng.uniform(-90.0, 40.0, 64)
    gates = rng.uniform(0.01, 0.99, (3, 64))
    return V, gates


def test_native_library_builds_and_matches_jax_bistable(rng_states):
    V, _ = rng_states
    native = NativeIonicModel('bistable', scale=1.3)
    jaxm = BiStableJAX(scale=1.3)
    y = V[None, :]
    assert np.allclose(native.f(y), np.asarray(jaxm.f(jnp.asarray(y))), rtol=1e-14)
    assert native.initial_values()[0] == float(jaxm.initial_values()[0])
    assert native.rho_f_expl() == jaxm.rho_f_expl()


def test_native_library_matches_jax_hodgkinhuxley(rng_states):
    V, gates = rng_states
    native = NativeIonicModel('hodgkinhuxley', scale=1.0)
    jaxm = HodgkinHuxleyJAX(scale=1.0)
    y = np.concatenate([V[None, :], gates], axis=0)
    yj = jnp.asarray(y)

    assert np.allclose(native.f(y), np.asarray(jaxm.f(yj)), rtol=1e-13)
    assert np.allclose(native.f_expl(y), np.asarray(jaxm.f_expl(yj)), rtol=1e-13)
    assert np.allclose(native.lmbda_exp(y), np.asarray(jaxm.lmbda_exp(yj)), rtol=1e-13)
    lm_n, yi_n = native.lmbda_yinf_exp(y)
    lm_j, yi_j = jaxm.lmbda_yinf_exp(yj)
    assert np.allclose(lm_n, np.asarray(lm_j), rtol=1e-13)
    assert np.allclose(yi_n, np.asarray(yi_j), rtol=1e-13)
    assert np.allclose(native.initial_values(), np.asarray(jaxm.initial_values()))


def test_hh_single_cell_action_potential():
    """A stimulated HH cell must fire an action potential (V > 0) and
    repolarize; checked against scipy on the pure ODE."""
    from scipy.integrate import solve_ivp

    m = HodgkinHuxleyJAX()
    y0 = np.asarray(m.initial_values())

    def rhs(t, y):
        out = np.array(m.f(jnp.asarray(y[:, None])))[:, 0]
        out[0] += 20.0 if t < 2.0 else 0.0  # stimulus
        return out

    sol = solve_ivp(rhs, (0, 20.0), y0, rtol=1e-8, atol=1e-8, dense_output=True)
    V = sol.y[0]
    assert V.max() > 0.0, 'no action potential fired'
    assert V[-1] < -50.0, 'did not repolarize'


def test_monodomain_wave_propagates():
    desc = dict(
        problem_class=MonodomainIMEX,
        problem_params=dict(nvars=128, ionic_model='hodgkinhuxley', diff=0.1, L=10.0,
                            stim_dur=2.0, stim_ampl=40.0),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-8),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0)
    uend, _ = c.run(u0, 0.0, 8.0)
    V = np.asarray(uend[0])
    assert np.isfinite(V).all()
    # the action potential must have spread beyond the stimulus region
    assert V.max() > 0.0, 'no depolarization'
    far = V[len(V) // 3 : len(V) // 2]
    assert far.max() > -60.0, 'wave did not propagate'


def test_esdc_phi_functions_accurate():
    """phi_k quadrature vs the defining power series."""
    import math

    from pysdc_tpu.sweepers.imexexp import IMEXEXPSweeper

    sw = IMEXEXPSweeper(dict(num_nodes=3))

    def phi_exact(z):
        if abs(z) >= 1:  # recurrence, stable for large |z|
            out = [(math.exp(z) - 1.0) / z]
            for k in (1, 2):
                out.append((out[-1] - 1.0 / math.factorial(k)) / z)
            return np.array(out)
        return np.array([sum(z**n / math.factorial(n + k) for n in range(40)) for k in (1, 2, 3)])

    for z in (-20.0, -5.0, -0.5, 1.5):
        phi = np.asarray(sw._phi_eval(jnp.asarray([1.0]), 3, jnp.asarray([z]))[0, :, 0])
        exact = phi_exact(z)
        assert np.abs((phi - exact) / exact).max() < 1e-8, (z, phi, exact)


def test_esdc_monodomain_accuracy_and_convergence():
    """ESDC (Rush-Larsen exponential SDC) on HH monodomain vs a tight IMEX
    SDC reference."""
    from pysdc_tpu.models.monodomain import MonodomainIMEX, MonodomainIMEXEXP
    from pysdc_tpu.sweepers.imexexp import IMEXEXPSweeper

    pp = dict(nvars=128, ionic_model='hodgkinhuxley', diff=0.1, L=10.0)
    desc = dict(
        problem_class=MonodomainIMEX,
        problem_params=pp,
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=5, QI='LU'),
        level_params=dict(dt=0.005, restol=1e-11),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uref, _ = c.run(P.u_exact(0.0), 0.0, 0.5)

    errs = []
    for dt in (0.05, 0.025):
        desc2 = dict(
            problem_class=MonodomainIMEXEXP,
            problem_params=pp,
            sweeper_class=IMEXEXPSweeper,
            sweeper_params=dict(num_nodes=3, QI='IE'),
            level_params=dict(dt=dt, restol=1e-9),
            step_params=dict(maxiter=50),
        )
        c2 = ControllerNonMPI(1, {'logger_level': 40}, desc2)
        P2 = c2.MS[0].levels[0].prob
        u2, s2 = c2.run(P2.u_exact(0.0), 0.0, 0.5)
        iters = [v for _, v in get_sorted(s2, type='niter')]
        assert max(iters) < 50, 'ESDC failed to converge'
        errs.append(float(jnp.max(jnp.abs(u2 - uref))))
    assert errs[0] < 2e-3
    assert errs[1] < errs[0] / 2, errs  # error must drop with dt


# ---------------------------------------------------------------------------
# Full physiological models: Courtemanche 1998, ten Tusscher 2006 (+smooth)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('name', ['courtemanche', 'tentusscher', 'tentusscher_smooth'])
def test_native_matches_jax_full_models(name):
    """C++ and JAX implementations agree elementwise on a V sweep through
    every rate branch, with perturbed physiological gating/concentration
    states (mirrors the reference's ionicmodels build-and-run gate)."""
    from pysdc_tpu.models.ionic import JAX_MODELS

    native = NativeIonicModel(name, scale=1.0)
    jaxm = JAX_MODELS[name](scale=1.0)
    assert native.size == jaxm.size
    y0 = native.initial_values()
    rng = np.random.default_rng(7)
    Y = y0[:, None] * (1.0 + 0.05 * rng.standard_normal((native.size, 64)))
    Y[0] = np.linspace(-90.0, 40.0, 64)  # sweep V through all branches
    conc = (16, 17, 18, 19, 20) if name == 'courtemanche' else (13, 14, 15, 17, 18)
    for i in conc:
        Y[i] = np.abs(Y[i]) + 1e-6
    Yj = jnp.asarray(Y)

    fn, fj = native.f(Y), np.asarray(jaxm.f(Yj))
    assert np.max(np.abs(fn - fj) / (1e-12 + np.abs(fn))) < 1e-8
    ln, lj = native.lmbda_exp(Y), np.asarray(jaxm.lmbda_exp(Yj))
    assert np.max(np.abs(ln - lj)) < 1e-8
    ln2, yn2 = native.lmbda_yinf_exp(Y)
    lj2, yj2 = jaxm.lmbda_yinf_exp(Yj)
    assert np.max(np.abs(yn2 - np.asarray(yj2))) < 1e-10
    assert np.allclose(native.initial_values(), np.asarray(jaxm.initial_values()))
    assert native.rho_f_expl() == jaxm.rho_f_expl()
    # f_expl only writes the nonlinear indices
    fe_n, fe_j = native.f_expl(Y), np.asarray(jaxm.f_expl(Yj))
    for i in jaxm.f_expl_indices:
        assert np.max(np.abs(fe_n[i] - fe_j[i]) / (1e-12 + np.abs(fe_n[i]))) < 1e-8


@pytest.mark.parametrize('name', ['courtemanche', 'tentusscher'])
def test_full_models_resting_state_is_quasi_steady(name):
    """The published initial values are (near) resting states: one relaxed
    step must not blow up, and dV/dt must be small."""
    native = NativeIonicModel(name)
    y0 = native.initial_values()
    f0 = native.f(y0[:, None])
    assert np.max(np.abs(f0[0])) < 0.01, 'resting potential must be quasi-steady'
    assert np.all(np.isfinite(f0))


def test_monodomain_with_tentusscher_runs():
    """Monodomain with the full ventricular model via exponential SDC (the
    reference's integrator for stiff ionic models): a stimulated strip
    produces a finite depolarization."""
    from pysdc_tpu.models.monodomain import MonodomainIMEXEXP
    from pysdc_tpu.sweepers.imexexp import IMEXEXPSweeper

    desc = dict(
        problem_class=MonodomainIMEXEXP,
        problem_params=dict(nvars=64, ionic_model='tentusscher', diff=1.0e-1, L=10.0,
                            stim_ampl=40.0, stim_dur=2.0),
        sweeper_class=IMEXEXPSweeper,
        sweeper_params=dict(num_nodes=3, QI='IE'),
        level_params=dict(dt=0.02, restol=1e-8),
        step_params=dict(maxiter=20),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    uend, stats = c.run(P.u_exact(0.0), 0.0, 0.4)
    V = np.asarray(uend[0])
    assert np.all(np.isfinite(np.asarray(uend)))
    # stimulated region (left edge) must have depolarized away from rest
    assert V.max() > -80.0
