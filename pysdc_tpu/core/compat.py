"""Backend compatibility helpers.

The axon TPU tunnel does not implement complex host<->device TRANSFERS
(``UNIMPLEMENTED: TPU backend error``) in either direction — and because
transfers are asynchronous, the failure surfaces at the NEXT transfer and
poisons the stream for the rest of the process, which made the root cause
look like a bool/f32 transfer bug (round-5 diagnosis).  On-device complex
is fully supported: fft outputs, ``lax.complex``, complex matmuls, and
complex NUMPY constants baked into jitted programs at trace time (those
embed through MLIR without a runtime transfer).

Rules this module encodes:

- complex constants used inside jitted code must be stored as NUMPY
  arrays (a pre-made complex DEVICE array captured as a jit constant is
  read BACK to host for embedding — a broken transfer);
- eager complex host->device movement must go through two real transfers
  plus an on-device ``lax.complex`` combine.

``complex_asarray`` picks the right form by context: under a trace it is
a plain ``jnp.asarray`` (MLIR constant); eagerly it split-transfers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _tracing() -> bool:
    try:
        return not jax.core.trace_state_clean()
    except AttributeError:  # newer/older jax: fall back to a cheap probe
        return isinstance(jnp.zeros(()), jax.core.Tracer)


def complex_asarray(a, dtype=None):
    """``jnp.asarray`` that is safe for complex host data (or a complex
    target dtype) on every backend: eagerly, only REAL buffers ever cross
    the host<->device boundary; under a trace it embeds as a constant."""
    a = np.asarray(a)
    want_complex = np.iscomplexobj(a) or (
        dtype is not None and jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)
    )
    if not want_complex:
        return jnp.asarray(a) if dtype is None else jnp.asarray(a, dtype)
    if dtype is None:
        dtype = jnp.result_type(a.dtype)  # honors the x64 setting
    if _tracing():
        return jnp.asarray(a, dtype)
    rdt = np.zeros((), jnp.dtype(dtype)).real.dtype
    if not np.iscomplexobj(a):
        return jnp.asarray(a, rdt).astype(dtype)
    re = jnp.asarray(np.ascontiguousarray(a.real), rdt)
    im = jnp.asarray(np.ascontiguousarray(a.imag), rdt)
    return jax.lax.complex(re, im).astype(dtype)
