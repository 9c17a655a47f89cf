"""Profiling hooks: jax.profiler traces of controller runs.

The reference instruments with Score-P in a patched controller
(projects/Performance/controller_MPI_scorep.py); the TPU-native equivalent
records an XLA/TPU trace with ``jax.profiler`` around the run, viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import jax

from pysdc_tpu.core.hooks import Hooks


class ProfilerHook(Hooks):
    """Traces the whole run into ``trace_dir`` (class attribute)."""

    trace_dir = '/tmp/pysdc_tpu_trace'

    def pre_run(self, step, level_number):
        super().pre_run(step, level_number)
        if not getattr(ProfilerHook, '_active', False):
            jax.profiler.start_trace(self.trace_dir)
            ProfilerHook._active = True

    def post_run(self, step, level_number):
        super().post_run(step, level_number)
        if getattr(ProfilerHook, '_active', False):
            jax.profiler.stop_trace()
            ProfilerHook._active = False
