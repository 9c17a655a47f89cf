"""Step 26: embedding campaign — pysdc_tpu inside a host framework.

The reference couples pySDC into Gusto as a ``TimeDiscretisation``
(``helpers/pySDC_as_gusto_time_discretization.py:35``): an outer framework
owns the time loop and calls the controller per step, stats accumulating
across calls.  This campaign drives both TPU-native embeddings
(``utils/embedding.py``) the same way a host framework would:

1. **Host-side** (`ControllerAsStepper`): an external Python loop marches a
   forced heat problem one block at a time; the accumulated stats must
   contain every step's iteration count and the march must land on the
   exact solution — the Gusto-coupling contract.

2. **Device-side** (`make_sdc_step_function(fixed_sweeps=k)`): the SDC
   integrator is traced INTO an outer JAX program — here a gradient-based
   initial-condition inversion: recover u(0) from an observation of u(T)
   by differentiating *through* the time stepper (`jax.grad` over
   `lax.scan` of SDC steps).  This adjoint-through-the-integrator loop is
   the embedding a CUDA/MPI framework cannot offer; the reference's Gusto
   coupling stops at the host-side variant.
"""

import jax

jax.config.update('jax_enable_x64', True)
jax.config.update('jax_platforms', 'cpu')

import os

import jax.numpy as jnp
import numpy as np

from pysdc_tpu import GenericImplicit, get_sorted
from pysdc_tpu.models.heat import HeatND, HeatNDForced
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.embedding import ControllerAsStepper, make_sdc_step_function
from pysdc_tpu.utils.golden import GoldenStore


def host_framework_march(n=128, dt=0.05, n_steps=8):
    """An outer (non-JAX) framework owns the loop; the controller is a
    ``(u, t) -> u`` stepper with stats accumulating across applies."""
    desc = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=2, nvars=n, bc='periodic'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-10, dt=dt),
        step_params=dict(maxiter=20),
    )
    stepper = ControllerAsStepper(ControllerNonMPI, desc, {'logger_level': 40}, dt)
    P = stepper.controller.MS[0].levels[0].prob

    u, t = P.u_exact(0.0), 0.0
    for _ in range(n_steps):  # the HOST framework's loop, not ours
        u = stepper.apply(u, t)
        t += dt
    err = float(jnp.max(jnp.abs(u - P.u_exact(t))))
    iters = [v for _, v in get_sorted(stepper.stats, type='niter')]
    print(f'host-side march: {n_steps} applies, niter per step {iters}, err {err:.2e}')
    assert len(iters) == n_steps, 'stats must accumulate across applies'
    # spatial truncation of the 2nd-order FD grid dominates here
    assert err < 2e-4, err
    return iters, err


def adjoint_initial_condition_inversion(n=48, dt=0.02, n_steps=10, k_sweeps=4,
                                        n_opt=300, lr=0.2):
    """Differentiate through the SDC integrator: recover u(0) from u(T)."""
    import optax

    prob = HeatND(nvars=(n, n), nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'LU'})
    step = make_sdc_step_function(prob, sweep, fixed_sweeps=k_sweeps)

    def forward(u0):
        def body(carry, i):
            u, t = carry
            return (step(u, t, dt), t + dt), None

        (uT, _), _ = jax.lax.scan(body, (u0, 0.0), jnp.arange(n_steps))
        return uT

    u0_true = prob.u_exact(0.0)
    target = forward(u0_true)

    def loss(u):
        return jnp.mean((forward(u) - target) ** 2)

    # heat is dissipative: the inverse problem is ill-posed for high modes,
    # but the low-mode IC used here is recoverable to optimizer precision.
    # The ENTIRE optimization (Adam over the adjoint of n_steps SDC steps of
    # k sweeps each) compiles into one scan — the host never intervenes.
    opt = optax.adam(lr)

    @jax.jit
    def optimize(u0):
        state = opt.init(u0)

        def body(carry, i):
            u0, state = carry
            l, g = jax.value_and_grad(loss)(u0)
            updates, state = opt.update(g, state)
            return (optax.apply_updates(u0, updates), state), l

        (u0, _), ls = jax.lax.scan(body, (u0, state), jnp.arange(n_opt))
        return u0, ls

    u0_rec, ls = optimize(jnp.zeros_like(u0_true))
    l0, lT = float(ls[0]), float(loss(u0_rec))
    print(f'adjoint inversion: loss {l0:.3e} -> {lT:.3e} '
          f'({n_opt} Adam steps through {n_steps} SDC steps x {k_sweeps} sweeps)')
    assert lT < 5e-6 * l0, 'gradient through the integrator did not converge'
    return l0, lT


def main():
    iters, err = host_framework_march()
    l0, lT = adjoint_initial_condition_inversion()

    store = GoldenStore(os.path.join(os.path.dirname(__file__), 'golden', 'step_26_embedding.json'))
    store.check('host_march_niter', iters)
    store.check('host_march_err', [err], rtol=1e-6, atol=1e-12)
    store.check('adjoint_loss_reduction_log10', [float(np.log10(l0 / lT))], rtol=0.2)
    store.flush()
    print('golden gates: OK')


if __name__ == '__main__':
    main()
