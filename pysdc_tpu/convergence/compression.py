"""Lossy-compression error injection (compression research support).

Counterpart of the reference ``Compression`` convergence controller
(projects/compression/compression_convergence_controller.py): after every
iteration the node solutions are round-tripped through a lossy compressor
with an absolute error bound and the RHS is re-evaluated, so the effect of
storing/communicating compressed state on SDC convergence order can be
studied (projects/compression/order.py).

The reference delegates to libpressio/SZ3 on the host.  The TPU-native
default compressor is *uniform quantization at the absolute error bound* —
the same error model as SZ3's ``pressio:abs`` mode (errors bounded by, and
near-uniform within, +/- abs_bound) — implemented as a pure jitted array
transform so the round-trip costs one fused elementwise kernel instead of a
device->host->device copy.  A custom ``compressor`` callable (e.g. a real
host-side codec) can be supplied instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.convergence import ConvergenceController


def quantize_roundtrip(u, abs_bound):
    """Encode/decode through uniform scalar quantization with bin width
    ``2*abs_bound``: the reconstruction error is bounded by ``abs_bound``."""
    width = 2.0 * abs_bound
    return jnp.round(u / width) * width


class Compression(ConvergenceController):
    """params: ``abs_bound`` (default 1e-10), ``compressor`` (optional
    callable u -> u_roundtripped, overrides the quantizer)."""

    def setup(self, controller, params, description, **kwargs):
        defaults = {
            'control_order': 0,
            'abs_bound': 1e-10,
            'compressor': None,
            **super().setup(controller, params, description, **kwargs),
        }
        self._roundtrip_jit = None
        return defaults

    def post_iteration_processing(self, controller, S, **kwargs):
        if len(S.levels) != 1:
            raise ValueError('Compression supports single-level runs (reference :36)')
        L = S.levels[0]
        if L.state is None:
            return
        prob = L.prob
        compressor = self.params.compressor
        if compressor is None:
            if self._roundtrip_jit is None:
                bound = float(self.params.abs_bound)
                self._roundtrip_jit = jax.jit(lambda u: quantize_roundtrip(u, bound))
            u_comp = self._roundtrip_jit(L.state.u)
        else:
            u_comp = jnp.asarray(
                np.stack([np.asarray(compressor(np.asarray(u))) for u in L.state.u])
            ).astype(L.state.u.dtype)
        nodes = np.append(0.0, L.sweep.coll.nodes)
        t_nodes = L.time + L.dt * jnp.asarray(nodes)
        f_new = prob.eval_f_batched(u_comp, t_nodes)
        L.state = L.state._replace(u=u_comp, f=f_new)
