"""Interpolate the collocation polynomial as initial guess after restarts.

Mirrors reference ``InterpolateBetweenRestarts``
(convergence_controller_classes/interpolate_between_restarts.py): when a step
is restarted with a smaller dt, the node values of the rejected attempt are
interpolated onto the new node positions and override the sweeper's
prediction.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController
from pysdc_tpu.core.state import LevelState
from pysdc_tpu.ops.lagrange import interpolation_matrix


class InterpolateBetweenRestarts(ConvergenceController):
    def setup(self, controller, params, description, **kwargs):
        return {'control_order': 50, **super().setup(controller, params, description, **kwargs)}

    def setup_status_variables(self, controller, **kwargs):
        self.status = SimpleNamespace(u_inter=[], f_inter=[], perform_interpolation=False)

    def post_iteration_processing(self, controller, step, **kwargs):
        if step.status.restart and all(level.status.dt_new for level in step.levels):
            self.status.u_inter = []
            self.status.f_inter = []
            for level in step.levels:
                nodes_old = np.append(0, level.sweep.coll.nodes)
                nodes_new = np.append(0, level.sweep.coll.nodes * level.status.dt_new / level.params.dt)
                P = interpolation_matrix(nodes_old, nodes_new)
                Pj = jnp.asarray(P, level.state.u.dtype)
                self.status.u_inter.append(jnp.tensordot(Pj, level.state.u, axes=(1, 0)))
                self.status.f_inter.append(
                    jnp.tensordot(jnp.asarray(P), level.state.f, axes=(1, 0))
                    if not isinstance(level.state.f, tuple)
                    else type(level.state.f)(
                        *[jnp.tensordot(jnp.asarray(P, leaf.dtype), leaf, axes=(1, 0)) for leaf in level.state.f]
                    )
                )
                self.status.perform_interpolation = True
                self.log(
                    f'Interpolating before restart from dt={level.params.dt:.2e} to dt={level.status.dt_new:.2e}',
                    step,
                )
        else:
            self.status.perform_interpolation = False

    def post_spread_processing(self, controller, step, **kwargs):
        if self.status.perform_interpolation:
            for i, level in enumerate(step.levels):
                level.state = LevelState(
                    u=self.status.u_inter[i], f=self.status.f_inter[i], tau=level.state.tau
                )
            self.status.perform_interpolation = False
            self.status.u_inter = []
            self.status.f_inter = []
