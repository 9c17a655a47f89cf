"""Switch the collocation rule between iterations within one step.

Counterpart of the reference ``AdaptiveCollocation``
(``implementations/convergence_controller_classes/adaptive_collocation.py:7-245``):
a list of collocation configurations is solved in sequence — whenever the
current collocation problem reaches ``restol``, the solution is interpolated
onto the next rule's nodes (barycentric Lagrange, a small node-axis matmul),
the right-hand side is re-evaluated, and iteration continues.  The step ends
once the last configuration converges.

TPU-native twist: the reference rebuilds the sweeper in place per switch;
here every configuration's sweeper + jitted level machinery is built once at
setup and cached, so switching is a dictionary swap plus one interpolation
matmul — no re-tracing after the first step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController
from pysdc_tpu.core.errors import ParameterError
from pysdc_tpu.core.state import LevelState
from pysdc_tpu.ops.lagrange import interpolation_matrix

_ALLOWED_SWEEPER_KEYS = ('quad_type', 'num_nodes', 'node_type', 'do_coll_update')
_ALLOWED_LEVEL_KEYS = ('restol',)


class AdaptiveCollocation(ConvergenceController):
    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': 300,
            **super().setup(controller, params, description, **kwargs),
        }
        self.vary_keys_sweeper = []
        self.vary_keys_level = []
        self.num_colls = 0
        for key, val in params.items():
            if isinstance(val, list):
                if key in _ALLOWED_SWEEPER_KEYS:
                    self.vary_keys_sweeper.append(key)
                elif key in _ALLOWED_LEVEL_KEYS:
                    self.vary_keys_level.append(key)
                else:
                    raise ParameterError(f"Don't know what to do with key {key} here!")
                self.num_colls = max(self.num_colls, len(val))
        self.sweeper_params = dict(description['sweeper_params'])
        self.sweeper_class = description['sweeper_class']
        if description['level_params'].get('restol', -1.0) <= 1e-16:
            raise ParameterError(
                'Switching collocation problems requires an attainable restol in the level params'
            )
        self._variants = None  # lazily built per level: list of dicts
        self.active_coll = 0
        return defaults

    # -- variant cache --------------------------------------------------
    def _build_variants(self, S):
        self._variants = []
        for lvl in S.levels:
            variants = []
            for i in range(self.num_colls):
                sp = dict(self.sweeper_params)
                for key in self.vary_keys_sweeper:
                    sp[key] = self.params.get(key)[i]
                sweep = self.sweeper_class(sp)
                lp = {}
                for key in self.vary_keys_level:
                    lp[key] = self.params.get(key)[i]
                variants.append(dict(sweep=sweep, level_overrides=lp, fns=None))
            self._variants.append(variants)

    def _activate(self, S, idx, interpolate):
        for lvl, variants in zip(S.levels, self._variants):
            var = variants[idx]
            old_sweep = lvl.sweep
            old_nodes = np.append(0, old_sweep.coll.nodes)
            old_state = lvl.state

            if var['fns'] is None:
                lvl.sweep = var['sweep']
                var['sweep'].level = lvl
                lvl._build_jitted()
                var['fns'] = {
                    name: getattr(lvl, name)
                    for name in (
                        '_predict_fn', '_update_fn', '_residual_fn', '_endpoint_fn',
                        '_endpoint_embedded_fn', '_integrate_fn', '_eval_f0',
                    )
                    if hasattr(lvl, name)
                }
            else:
                lvl.sweep = var['sweep']
                var['sweep'].level = lvl
                for name, fn in var['fns'].items():
                    setattr(lvl, name, fn)
            for key, val in var['level_overrides'].items():
                setattr(lvl.params, key, val)

            if interpolate and old_state is not None:
                new_nodes = np.append(0, lvl.sweep.coll.nodes)
                I = jnp.asarray(interpolation_matrix(old_nodes, new_nodes))
                u_new = jax.tree_util.tree_map(
                    lambda leaf: jnp.tensordot(I.astype(leaf.dtype), leaf, axes=(1, 0)),
                    old_state.u,
                )
                # re-evaluate the rhs at the interpolated values (reference
                # adaptive_collocation.py:163-166 uses the step time)
                t = lvl.status.time
                M_new = lvl.sweep.coll.num_nodes
                f_list = [lvl.prob.eval_f(jax.tree_util.tree_map(lambda leaf: leaf[m], u_new), t)
                          for m in range(M_new + 1)]
                f_new = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls, 0), *f_list)
                tau_new = jax.tree_util.tree_map(
                    lambda leaf: jnp.zeros((M_new,) + leaf.shape[1:], leaf.dtype), u_new
                )
                lvl.state = LevelState(u=u_new, f=f_new, tau=tau_new)
                lvl.status.unlocked = True
                lvl.status.updated = True

    # -- controller hooks ------------------------------------------------
    def reset_status_variables(self, controller, **kwargs):
        self.active_coll = 0

    def post_spread_processing(self, controller, S, **kwargs):
        self.active_coll = 0
        if self._variants is None:
            self._build_variants(S)
        # re-predict (only levels that hold state, i.e. the fine level) with
        # the first collocation configuration
        u0s = [
            jax.tree_util.tree_map(lambda leaf: leaf[0], lvl.state.u) if lvl.state is not None else None
            for lvl in S.levels
        ]
        self._activate(S, 0, interpolate=False)
        for lvl, u0 in zip(S.levels, u0s):
            if u0 is not None:
                lvl.predict(u0)

    def post_iteration_processing(self, controller, S, **kwargs):
        if self.active_coll < self.num_colls - 1 and S.status.done:
            self.active_coll += 1
            S.status.done = False
            self.log(f'Switching to collocation {self.active_coll + 1} of {self.num_colls}', S)
            self._activate(S, self.active_coll, interpolate=True)
