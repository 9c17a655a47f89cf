"""External-framework embedding (analog of the reference's Gusto coupling,
helpers/pySDC_as_gusto_time_discretization.py:35): controllers as steppers
driven by an outer loop, and pure jittable SDC steps inside external
jit/scan programs."""

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.utils.embedding import ControllerAsStepper, make_sdc_step_function
from pysdc_tpu.utils.stats import get_sorted


def _heat_desc(dt):
    return dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=dt, restol=1e-11),
        step_params=dict(maxiter=30),
    )


def test_sdc_step_inside_external_scan():
    """An external JAX program embeds the SDC step in its own lax.scan +
    jit; result matches the exact solution to collocation accuracy."""
    prob = HeatND(nvars=64, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'QI': 'LU'})
    step = make_sdc_step_function(prob, sweep, restol=1e-11, maxiter=30)

    dt, n = 0.05, 10

    @jax.jit
    def external_program(u0):
        def body(carry, k):
            u, t = carry
            return (step(u, t, dt), t + dt), None

        (u, _), _ = jax.lax.scan(body, (u0, 0.0), jnp.arange(n))
        return u

    u = external_program(prob.u_exact(0.0))
    err = float(jnp.max(jnp.abs(u - prob.u_exact(n * dt))))
    assert err < 1e-7, err


def test_sdc_step_is_vmappable():
    """The pure step maps over a batch of initial conditions — e.g. an
    ensemble driven by an outer framework."""
    prob = HeatND(nvars=32, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'QI': 'LU'})
    step = make_sdc_step_function(prob, sweep, restol=1e-11, maxiter=30)

    u0 = prob.u_exact(0.0)
    batch = jnp.stack([u0, 2 * u0, -u0])
    out = jax.vmap(lambda u: step(u, 0.0, 0.05))(batch)
    one = step(u0, 0.0, 0.05)
    assert float(jnp.max(jnp.abs(out[0] - one))) < 1e-13
    assert float(jnp.max(jnp.abs(out[1] - 2 * one))) < 5e-11  # linear problem


def test_k_dependent_preconditioner_rejected():
    prob = HeatND(nvars=32, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'QI': 'MIN-SR-FLEX'})
    try:
        make_sdc_step_function(prob, sweep)
    except ValueError as e:
        assert 'k-dependent' in str(e)
    else:
        raise AssertionError('expected ValueError for MIN-SR-FLEX')


def test_controller_as_stepper_accumulates_stats():
    """Outer framework owns the time loop; each apply runs one controller
    block; stats accumulate across applies (reference
    pySDC_integrator.stats)."""
    dt = 0.1
    stepper = ControllerAsStepper(ControllerNonMPI, _heat_desc(dt), {'logger_level': 40},
                                  dt=dt, n_steps=2)
    prob = stepper.controller.MS[0].levels[0].prob
    u = prob.u_exact(0.0)
    t = 0.0
    for _ in range(4):  # the EXTERNAL loop
        u = stepper.apply(u, t)
        t += dt
    err = float(jnp.max(jnp.abs(u - prob.u_exact(t))))
    assert err < 5e-8, err
    niter = get_sorted(stepper.stats, type='niter')
    assert len(niter) == 8  # 4 applies x 2 substeps accumulated
    assert abs(stepper.reached(t) - t) < 1e-12


def test_fixed_sweeps_step_is_differentiable():
    """fixed_sweeps mode: jax.grad flows through the whole SDC step
    (predict -> k sweeps -> end point)."""
    prob = HeatND(nvars=32, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'QI': 'LU'})
    step = make_sdc_step_function(prob, sweep, fixed_sweeps=5)

    u0 = prob.u_exact(0.0)

    def loss(scale):
        return jnp.sum(step(scale * u0, 0.0, 0.05) ** 2)

    g = jax.grad(loss)(1.0)
    # linear problem: loss = scale^2 * ||step(u0)||^2 -> g = 2 * loss(1)
    assert np.isfinite(float(g))
    assert abs(float(g) - 2 * float(loss(1.0))) < 1e-9
