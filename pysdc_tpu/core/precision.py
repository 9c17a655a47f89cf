"""TPU numerics policy: matmul precision for tolerance-driven convergence.

On TPU the MXU multiplies float32 operands at bfloat16 input precision by
default.  For the large spatial matmuls that is usually the right trade, but
pySDC-style frameworks terminate on *residual tolerances* (reference
``pySDC/core/sweeper.py:164-222``; restol/e_tol gates throughout the
tutorials, e.g. ``tutorial/step_2/C_using_pySDCs_frontend.py:15,32,74``).
Running the small node-axis contractions (Q-matrix integrals, transfer
interpolation, eigenbasis transforms) at bf16 input precision puts a hard
floor of ~1e-3 under the achievable residual — restol-driven runs then
iterate to maxiter without ever converging on hardware, while the identical
program converges in one iteration at full precision.

Policy (two layers):

1. A package-level default: importing :mod:`pysdc_tpu` sets JAX's global
   ``jax_default_matmul_precision`` to ``'highest'`` (full float32 on the
   MXU).  Override with the environment variable
   ``PYSDC_TPU_MATMUL_PRECISION`` ∈ {``default``, ``high``, ``highest``,
   ``keep``} — ``keep`` leaves JAX's setting untouched (for users who manage
   precision themselves).
2. Explicit ``precision=Precision.HIGHEST`` on the convergence-critical
   coefficient contractions (node-axis Q/QI/weights products, collocation
   and space transfer matrices, eigenbasis solves).  These are (M, M)- or
   (N, N)-by-field products where bf16 inputs save almost nothing — the
   FLOPs are negligible next to the field traffic — but cost the entire
   convergence behavior.  They stay full-precision even when a user lowers
   the global default for speed of the large spatial matmuls.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

#: precision for small coefficient-matrix contractions along the node axis
#: and for transfer/eigenbasis matrices — always full float32 inputs.
COEFF_PRECISION = jax.lax.Precision.HIGHEST

_VALID = ('default', 'high', 'highest')


def configure_default_matmul_precision() -> str:
    """Set the global matmul precision from ``PYSDC_TPU_MATMUL_PRECISION``.

    Called once at package import.  Returns the applied mode ('keep' means
    JAX's current configuration was left alone).
    """
    mode = os.environ.get('PYSDC_TPU_MATMUL_PRECISION', 'highest').strip().lower()
    if mode == 'keep':
        return mode
    if mode not in _VALID:
        raise ValueError(
            f"PYSDC_TPU_MATMUL_PRECISION={mode!r} not understood; "
            f"choose one of {_VALID + ('keep',)}"
        )
    jax.config.update('jax_default_matmul_precision', mode)
    return mode


def coeff_contract(M, x, axes=(1, 0)):
    """``tensordot(M, x, axes)`` at full input precision.

    The shared primitive for applying small dense coefficient matrices
    (collocation Q/S/QDelta, Butcher tableaus, Lagrange transfer matrices)
    along the leading node axis of field arrays.
    """
    return jnp.tensordot(jnp.asarray(M, x.dtype), x, axes=axes, precision=COEFF_PRECISION)
