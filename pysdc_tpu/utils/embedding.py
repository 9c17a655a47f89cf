"""Embed pysdc_tpu integrators inside external frameworks.

Counterpart of the reference's Gusto coupling
(``helpers/pySDC_as_gusto_time_discretization.py:35`` +
``problem_classes/GenericGusto.py``): there, a pySDC controller is wrapped
as a Gusto ``TimeDiscretisation`` so an outer framework drives the time
loop, one controller block per ``apply``, with stats accumulated across
applies.  Two TPU-native embeddings:

  - :class:`ControllerAsStepper` — host-side: wrap ANY controller
    (virtual, sharded, ParaDiag) as a ``(u, t) -> u`` stepper an external
    Python/ML training loop can call; hook stats accumulate across calls
    exactly as the reference's ``pySDC_integrator.stats`` does.
  - :func:`make_sdc_step_function` — device-side: build a PURE, jittable
    ``(u, t, dt) -> u_next`` SDC step (predict -> while_loop of sweeps to
    restol/maxiter -> end point) that an external JAX program can trace
    straight into its own ``jit``/``lax.scan``/``grad`` — the embedding a
    CUDA/MPI framework fundamentally cannot offer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pysdc_tpu.utils.stats import get_sorted


def make_sdc_step_function(problem, sweeper, restol: float = 0.0, maxiter: int = 10,
                           residual_type: str = 'full_abs', fixed_sweeps: int | None = None):
    """Build a pure jittable single-step SDC integrator.

    Returns ``step(u, t, dt) -> u_next`` — safe to call inside an external
    ``jit``, ``lax.scan``, or ``vmap``.  Two iteration modes:

    - default: data-dependent iteration via ``lax.while_loop`` (sweeps
      until the collocation residual drops below ``restol`` or ``maxiter``
      is hit).  Not reverse-mode differentiable (while_loop limitation).
    - ``fixed_sweeps=k``: exactly k sweeps via ``lax.scan`` — fully
      ``jax.grad``-compatible, so the integrator can sit inside an outer
      optimization/adjoint loop (differentiating *through* the time
      stepper — the embedding a CUDA/MPI framework cannot offer).

    k-dependent preconditioners (MIN-SR-FLEX) support only the
    ``fixed_sweeps`` mode (the sweep index must be static).
    """
    if sweeper.k_dependent and fixed_sweeps is None:
        raise ValueError('k-dependent preconditioners need a static sweep count; '
                         'pass fixed_sweeps=... or use ControllerAsStepper')

    if fixed_sweeps is not None:
        def step(u, t, dt):
            state = sweeper.predict(problem, u, t, dt, 0.0)
            state = sweeper.update_nodes_k(problem, state, t, dt, fixed_sweeps)
            return sweeper.compute_end_point(state, t, dt)

        return step

    def step(u, t, dt):
        state = sweeper.predict(problem, u, t, dt, 0.0)
        _, res0 = sweeper.compute_residual(state, dt, residual_type)

        def cond(carry):
            k, _, res = carry
            return jnp.logical_and(res > restol, k < maxiter)

        def body(carry):
            k, s, _ = carry
            s = sweeper.update_nodes(problem, s, t, dt, 0)
            _, res = sweeper.compute_residual(s, dt, residual_type)
            return k + 1, s, res

        _, state, _ = jax.lax.while_loop(cond, body, (0, state, res0))
        return sweeper.compute_end_point(state, t, dt)

    return step


class ControllerAsStepper:
    """Wrap a pysdc_tpu controller as an external-framework time stepper.

    Mirrors the reference's ``pySDC_integrator`` surface
    (pySDC_as_gusto_time_discretization.py:35-180): the outer framework owns
    the time loop and calls :meth:`apply` once per step; each call runs one
    controller block of ``n_steps`` substeps of size ``dt / n_steps`` and
    all hook stats accumulate in :attr:`stats` across calls.

    Parameters
    ----------
    controller_class: e.g. ``ControllerNonMPI`` / ``ShardedController``.
    description / controller_params: the usual setup dicts; the level dt
        is overwritten with ``dt / n_steps``.
    dt: outer step size the external framework will advance by.
    n_steps: substeps per apply (the reference's multi-step subcycling).
    """

    def __init__(self, controller_class, description, controller_params, dt,
                 n_steps: int = 1, **controller_kwargs):
        description = dict(description)
        description['level_params'] = {**description.get('level_params', {}),
                                       'dt': float(dt) / n_steps}
        self.dt = float(dt)
        self.n_steps = n_steps
        self.controller = controller_class(n_steps, controller_params, description,
                                           **controller_kwargs)
        self.stats = {}

    def apply(self, u, t):
        """Advance u from t to t + dt; accumulates hook stats."""
        uend, stats = self.controller.run(u, float(t), float(t) + self.dt)
        self.stats = {**self.stats, **stats}
        return uend

    def reached(self, t_target):
        """Last time actually reached (adaptive runs may re-cut steps):
        max over accumulated 'dt' stats, like the reference's LogTime hook."""
        entries = get_sorted(self.stats, type='dt', recomputed=False)
        if not entries:
            return None
        return max(t + v for t, v in entries)
