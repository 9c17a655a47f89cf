"""Problem protocol: the model layer's contract with sweepers/levels.

TPU-native redesign of the reference ``Problem`` base
(``pySDC/core/problem.py:43-215``).  A problem is a *static* host object
(hashable by identity) holding compile-time configuration plus device-array
constants; its methods are pure traced functions of ``(u, t)`` so they can be
jitted, vmapped over collocation nodes, and sharded over a space mesh axis.

Key protocol (names follow the reference):
  - ``eval_f(u, t)``                  RHS evaluation -> array / IMEX / Comp2
  - ``solve_system(rhs, factor, u0, t)``  solve ``(I - factor*A) u = rhs``
    (for nonlinear problems: one Newton solve of ``u - factor*f(u) = rhs``)
  - ``u_exact(t)``                    exact/reference solution when known
  - ``u_init``                        zero state of the right shape/dtype

Batched variants (over the node axis) default to ``jax.vmap`` but can be
overridden with fused implementations.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ParameterError, ProblemError
from pysdc_tpu.core.state import IMEX, Comp2


class WorkCounter:
    """Host-side work counter (reference ``pySDC/core/problem.py:16-41``).

    JAX traces each jitted kernel once, so counters are incremented by the
    host orchestration layer with the statically-known work per kernel call
    (e.g. M RHS evaluations per sweep), not from inside traced code.
    """

    def __init__(self):
        self.niter = 0

    def __call__(self, n=1):
        self.niter += n

    def decrement(self, n=1):
        self.niter -= n

    def __str__(self):
        return str(self.niter)


class Problem:
    """Base class for all problems (static pytree-free host object)."""

    #: 'single' | 'imex' | 'comp2' — shape of the RHS pytree
    f_kind = 'single'

    def __init__(self, shape, dtype=None):
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype) if dtype is not None else jnp.zeros(0).dtype
        self.work_counters: dict[str, WorkCounter] = {}
        self.params: dict[str, Any] = {}

    # -- parameter registration (reference RegisterParams, core/common.py:25)
    def _register(self, **kwargs):
        for key, value in kwargs.items():
            setattr(self, key, value)
            self.params[key] = value

    # ------------------------------------------------------------------
    @property
    def u_init(self):
        return jnp.zeros(self.shape, self.dtype)

    @property
    def f_init(self):
        z = jnp.zeros(self.shape, self.dtype)
        if self.f_kind == 'imex':
            return IMEX(z, z)
        if self.f_kind == 'comp2':
            return Comp2(z, z)
        return z

    #: True once prepare_node_solvers installed per-node factorizations;
    #: sweepers then pass the static collocation-node index to solve_system
    #: as ``node=`` so the prepared factors can be selected at trace time
    accepts_node_index = False

    def prepare_node_solvers(self, dt: float, qd_diag) -> None:
        """Amortize shifted-solve factorizations across a run.

        Called at level setup with the concrete step size and the QDelta
        diagonal: the per-node shifts ``dt*q_mm`` are then known host-side,
        so operators with expensive structured factorizations (block cyclic
        reduction) can factor once and serve every sweep by substitution —
        the TPU role of the reference's dt-keyed splu cache
        (``generic_ND_FD.py:208-240``).  No-op unless ``self.A`` supports it.
        """
        import inspect

        A = getattr(self, 'A', None)
        if A is None or not hasattr(A, 'prepare_node_shifts'):
            return
        if 'node' not in inspect.signature(self.solve_system).parameters:
            return  # this problem's solve path cannot route the node index
        shifts = [float(dt) * float(q) for q in np.atleast_1d(qd_diag)]
        if A.prepare_node_shifts(shifts):
            self.accepts_node_index = True

    # -- protocol ------------------------------------------------------
    def eval_f(self, u, t):
        raise NotImplementedError('problem has to implement eval_f(u, t)')

    def solve_system(self, rhs, factor, u0, t):
        raise NotImplementedError('problem has to implement solve_system(rhs, factor, u0, t)')

    def solve_jacobian(self, rhs, factor, u=None, t=0.0):
        """Solve ``(I - factor * J(u)) x = rhs`` with the Jacobian evaluated
        at ``u`` (reference problem.py:198; used by ParaDiag).  For linear
        problems this is exactly ``solve_system``; ``factor`` may be complex."""
        return self.solve_system(rhs, factor, rhs, t)

    def u_exact(self, t):
        raise NotImplementedError(f'{type(self).__name__} does not implement u_exact(t)')

    # -- batched-over-nodes variants (override for fused TPU kernels) --
    def eval_f_batched(self, u, t):
        """u: (M, *shape), t: (M,) -> RHS pytree with leading node axis."""
        return jax.vmap(self.eval_f)(u, t)

    def solve_system_batched(self, rhs, factor, u0, t):
        """rhs/u0: (M, *shape), factor/t: (M,) -> (M, *shape)."""
        return jax.vmap(self.solve_system)(rhs, factor, u0, t)

    # -- reference solution via scipy (reference problem.py:118-152) --
    def generate_scipy_reference_solution(self, eval_rhs, t, u_init, t_init, **kwargs):
        """Accurate ODE reference via ``scipy.integrate.solve_ivp`` on the
        flattened system (host-side, float64)."""
        from scipy.integrate import solve_ivp

        kwargs = {'rtol': 1e-12, 'atol': 1e-12, 'method': 'DOP853', **kwargs}
        shape = np.asarray(u_init).shape

        def rhs_flat(tt, y):
            return np.asarray(eval_rhs(tt, y.reshape(shape))).ravel()

        sol = solve_ivp(rhs_flat, (float(t_init), float(t)), np.asarray(u_init).ravel(), **kwargs)
        if not sol.success:
            raise ProblemError(f'scipy reference solve failed: {sol.message}')
        return jnp.asarray(sol.y[:, -1].reshape(shape), dtype=self.dtype)

    def __repr__(self):
        return f'{type(self).__name__}(shape={self.shape}, dtype={self.dtype})'


def get_parameter(params: dict, key: str, default=None, required=False):
    if required and key not in params:
        raise ParameterError(f'need {key!r} to instantiate, only got {list(params)}')
    return params.get(key, default)
