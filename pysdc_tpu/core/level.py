"""Level: one (problem, sweeper) pair plus its device state.

Host-side orchestration wrapper around the functional core — the analog of
the reference ``Level`` (``pySDC/core/level.py:42``), but the node data is a
single :class:`LevelState` pytree and every protocol method dispatches to a
jit-compiled pure function (compiled once per level, reused across steps,
iterations and blocks; ``dt``/``t`` are traced so adaptive step sizes never
retrace).
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import jax

from pysdc_tpu.core.errors import ParameterError, UnlockError
from pysdc_tpu.core.state import LevelState


class LevelParams(SimpleNamespace):
    def __init__(self, params: dict):
        if 'dt' not in params and params.get('require_dt', True):
            raise ParameterError("need 'dt' in level_params")
        super().__init__(
            dt=params.get('dt'),
            dt_initial=params.get('dt'),
            restol=params.get('restol', -1.0),
            e_tol=params.get('e_tol', -1.0),
            nsweeps=params.get('nsweeps', 1),
            residual_type=params.get('residual_type', 'full_abs'),
        )
        for key, value in params.items():
            if not hasattr(self, key):
                setattr(self, key, value)


class Level:
    """Owns problem + sweeper + state; exposes the reference's level protocol."""

    def __init__(self, problem, sweeper, level_params: dict, level_index: int = 0):
        self.prob = problem
        self.sweep = sweeper
        self.sweep.level = self
        self.params = LevelParams(dict(level_params))
        self.level_index = level_index

        if getattr(sweeper, 'is_direct_solver', False) and self.params.restol > 0:
            # RK methods are direct solvers and may not compute a residual at
            # all (reference Runge_Kutta.py:322-328)
            import logging

            logging.getLogger('level').warning(
                'Overwriting residual tolerance with -1 because RK methods are direct!'
            )
            self.params.restol = -1.0

        self.state: LevelState | None = None
        self.uend = None
        self.uend_secondary = None  # embedded RK lower-order end point
        self.uold = None  # state snapshot for MLSDC prolongation
        self.fold = None
        self.residual = None  # (M, *shape) node residuals of last computation

        self.extra_status_vars: dict = {}
        self.status = SimpleNamespace(
            residual=None, unlocked=False, updated=False, time=None, dt_new=None, sweep=1
        )
        self.tag = None

        # amortized shifted-solve factorizations: the QDelta diagonal and dt
        # are concrete here, so operators can factor once per run (the
        # reference's dt-keyed splu cache, generic_ND_FD.py:208-240)
        QI = getattr(self.sweep, 'QI', None)
        if QI is not None and self.params.dt is not None:
            import numpy as np

            self.prob.prepare_node_solvers(float(self.params.dt), np.diag(np.asarray(QI))[1:])

        self._build_jitted()

    # ------------------------------------------------------------------
    def _build_jitted(self):
        prob, sweep = self.prob, self.sweep

        # mutable problem scalars (e.g. newton_tol driven by the
        # NewtonInexactness policy) enter the trace as *arguments*, so host
        # changes take effect without retracing
        self._traced_keys = tuple(k for k in ('newton_tol', 't_switch') if hasattr(prob, k))

        def _with_overrides(fn, overrides):
            old = {key: getattr(prob, key) for key in overrides}
            for key, val in overrides.items():
                setattr(prob, key, val)
            try:
                return fn()
            finally:
                for key, val in old.items():
                    setattr(prob, key, val)

        def _update(state, t, dt, k, overrides):
            return _with_overrides(lambda: sweep.update_nodes(prob, state, t, dt, k), overrides)

        if getattr(sweep, 'host_stateful', False):
            # multistep methods carry a host-side history cache: do not bake
            # it into a trace (inner solves/evals are still jitted)
            self._predict_fn = lambda u0, t, dt, rv: sweep.predict(prob, u0, t, dt, rv)
            self._update_fn = lambda state, t, dt, k, ov: sweep.update_nodes(prob, state, t, dt, k)
        else:
            self._predict_fn = jax.jit(lambda u0, t, dt, rv: sweep.predict(prob, u0, t, dt, rv))
            self._update_fn = jax.jit(_update, static_argnums=(3,))

        self._residual_fn = jax.jit(
            lambda state, dt, t: sweep.compute_residual(
                state, dt, residual_type=self.params.residual_type, t=t
            )
        )
        self._endpoint_fn = jax.jit(sweep.compute_end_point)
        if hasattr(sweep, 'compute_end_point_with_secondary'):
            self._endpoint_embedded_fn = jax.jit(sweep.compute_end_point_with_secondary)
        self._integrate_fn = jax.jit(sweep.integrate)
        self._eval_f0 = jax.jit(prob.eval_f)

    def _overrides(self):
        import jax.numpy as jnp

        return {key: jnp.asarray(getattr(self.prob, key)) for key in self._traced_keys}

    # -- properties mirroring the reference's level surface ------------
    @property
    def time(self):
        return self.status.time

    @property
    def dt(self):
        return self.params.dt

    @property
    def u(self):
        return self.state.u if self.state is not None else None

    @property
    def f(self):
        return self.state.f if self.state is not None else None

    @property
    def tau(self):
        return self.state.tau if self.state is not None else None

    # -- protocol ------------------------------------------------------
    def reset_level(self, reset_status: bool = True):
        """Reset all level data (reference level.py:110)."""
        if reset_status:
            self.status = SimpleNamespace(
                residual=None, unlocked=False, updated=False, time=None, dt_new=None, sweep=1
            )
            for name, init in self.extra_status_vars.items():
                setattr(self.status, name, init)
        self.state = None
        self.uend = None
        self.uend_secondary = None
        self.uold = None
        self.fold = None
        self.residual = None
        self.tag = None

    def predict(self, u0):
        """Fill node values from u0 using the sweeper's initial guess."""
        rv = self.sweep.draw_random_val() if self.sweep.initial_guess == 'random' else 0.0
        self.state = self._predict_fn(u0, self.status.time, self.params.dt, rv)
        self.status.unlocked = True
        self.status.updated = True

    def update_nodes(self):
        """One sweep (reference sweeper protocol update_nodes)."""
        if not self.status.unlocked:
            raise UnlockError('level is still locked, cannot use data from there')
        k = self.status.sweep if self.sweep.k_dependent else 0
        self.state = self._update_fn(self.state, self.status.time, self.params.dt, k, self._overrides())
        self.status.updated = True
        self._account_work()

    def _account_work(self):
        """Host-side work accounting: jitted kernels only tick counters at
        trace time, so the statically-known work per sweep is added here
        (one RHS evaluation and one implicit solve per collocation node;
        unlike the reference, 'newton'/'CG' counters count *solves*, not
        inner iterations)."""
        M = self.sweep.coll.num_nodes
        wc = self.prob.work_counters
        if 'rhs' in wc:
            wc['rhs'](M)
        for key in ('newton', 'CG', 'GMRES', 'linear'):
            if key in wc:
                wc[key](M)
                break

    def compute_residual(self, stage: str = ''):
        if stage in self.sweep.skip_residual_computation:
            self.status.residual = 0.0 if self.status.residual is None else self.status.residual
            return
        self.residual, self.status.residual = self._residual_fn(self.state, self.params.dt, self.status.time)
        self.status.updated = False

    def compute_end_point(self):
        if getattr(self.sweep, 'is_embedded', None) and self.sweep.is_embedded():
            self.uend, self.uend_secondary = self._endpoint_embedded_fn(
                self.state, self.status.time, self.params.dt
            )
        else:
            self.uend = self._endpoint_fn(self.state, self.status.time, self.params.dt)

    def integrate(self):
        return self._integrate_fn(self.state, self.params.dt)

    def set_u0(self, u0, eval_f: bool = True):
        """Replace u[0] (and re-evaluate f[0]) — the "recv" of the pipeline
        (reference controller_nonMPI.py:269-284).  ``u`` may be a pytree
        (e.g. Particles) with (M+1)-leading-axis leaves."""
        u = jax.tree_util.tree_map(lambda leaf, new: leaf.at[0].set(new), self.state.u, u0)
        f = self.state.f
        if eval_f:
            f0 = self._eval_f0(u0, self.status.time)
            f = jax.tree_util.tree_map(lambda leaf, new: leaf.at[0].set(new), f, f0)
        self.state = LevelState(u=u, f=f, tau=self.state.tau)
