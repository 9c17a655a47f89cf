"""Linear multistep methods as "sweepers".

Counterpart of the reference ``MultiStep`` family
(``implementations/sweeper_classes/Multistep.py``): an N-step method keeps a
host-side cache of previous (t, u, f) values; each step is one Euleresque
solve with the weighted history as right-hand side.  The cache makes this
sweeper host-stateful, so the level calls ``update_nodes`` un-jitted (the
inner solve/eval calls are still device-compiled).
"""

from __future__ import annotations

import jax.numpy as jnp

from pysdc_tpu.core.state import LevelState
from pysdc_tpu.core.sweeper import Sweeper


class Cache:
    """History of previous steps (reference Multistep.py:5-52)."""

    def __init__(self, num_steps: int):
        self.num_steps = num_steps
        self.u = [None] * num_steps
        self.f = [None] * num_steps
        self.t = [None] * num_steps

    def update(self, t, u, f):
        self.u = self.u[1:] + [u]
        self.f = self.f[1:] + [f]
        self.t = self.t[1:] + [t]

    @property
    def ready(self):
        return None not in self.t


class MultiStep(Sweeper):
    """Class attrs: alpha (N solution weights), beta (N+1 RHS weights, last
    one implicit).  First entries belong to the furthest past."""

    alpha: list = None
    beta: list = None

    #: the cache lives on the host; Level must not jit update_nodes
    host_stateful = True
    is_direct_solver = True

    def __init__(self, params: dict):
        params = dict(params)
        params['num_nodes'] = 1
        params['quad_type'] = 'RADAU-RIGHT'
        params.setdefault(
            'skip_residual_computation', ('IT_CHECK', 'IT_FINE', 'IT_COARSE', 'IT_UP', 'IT_DOWN')
        )
        super().__init__(params)
        self.steps = len(self.alpha)
        self.cache = Cache(self.steps)

    def predict(self, prob, u0, t, dt, random_val: float = 0.0) -> LevelState:
        f0 = prob.eval_f(u0, t)
        if not any(me is not None for me in self.cache.t):
            self.cache.update(float(t), u0, f0)
        u = jnp.stack([u0, u0], axis=0)
        f = jnp.stack([f0, f0], axis=0)
        tau = jnp.zeros((1,) + u0.shape, u0.dtype)
        return LevelState(u=u, f=f, tau=tau)

    def compute_residual(self, state, dt, residual_type='full_abs', t=0.0):
        return jnp.zeros_like(state.tau), jnp.zeros((), state.u.dtype)

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        time = t + dt
        if not self.cache.ready:
            u1 = self.generate_starting_values(prob, state, t, dt)
        else:
            dts = [self.cache.t[i + 1] - self.cache.t[i] for i in range(self.steps - 1)] + [
                float(time) - self.cache.t[-1]
            ]
            rhs = jnp.zeros_like(state.u[0])
            for i in range(len(self.alpha)):
                rhs = rhs - self.alpha[i] * self.cache.u[i]
                rhs = rhs + dts[i] * self.beta[i] * self.cache.f[i]
            u1 = prob.solve_system(rhs, dt * self.beta[-1], self.cache.u[-1], time)

        f1 = prob.eval_f(u1, time)
        self.cache.update(float(time), u1, f1)
        u = jnp.stack([state.u[0], u1], axis=0)
        f = jnp.stack([state.f[0], f1], axis=0)
        return LevelState(u=u, f=f, tau=state.tau)

    def generate_starting_values(self, prob, state, t, dt):
        raise NotImplementedError(
            'No implementation for generating solutions when not enough previous values are available!'
        )

    def reset_history(self):
        self.cache = Cache(self.steps)


class AdamsBashforthExplicit1Step(MultiStep):
    """Forward Euler as a 1-step method."""

    alpha = [-1.0]
    beta = [1.0, 0.0]


class BackwardEulerMultiStep(MultiStep):
    alpha = [-1.0]
    beta = [0.0, 1.0]


class AdamsMoultonImplicit1Step(MultiStep):
    """Trapezoidal rule as a multistep method."""

    alpha = [-1.0]
    beta = [0.5, 0.5]


class AdamsMoultonImplicit2Step(MultiStep):
    """Third-order implicit Adams-Moulton."""

    alpha = [0.0, -1.0]
    beta = [-1.0 / 12.0, 8.0 / 12.0, 5.0 / 12.0]

    def generate_starting_values(self, prob, state, t, dt):
        """Trapezoidal-rule starting step (reference Multistep.py:232-245)."""
        rhs = state.u[0] + dt / 2 * state.f[0]
        return prob.solve_system(rhs, dt / 2.0, state.u[0], t + dt)
