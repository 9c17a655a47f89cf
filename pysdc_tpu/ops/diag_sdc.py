"""Multi-sweep SDC in the operator's diagonal basis (linear problems).

For ``u' = A u`` with a diagonalizable operator (all-periodic FD stencil →
Fourier basis, tensor-product Dirichlet/Neumann → eigenbasis, spectral
symbol → Fourier), *every* piece of a generic-implicit sweep
(reference ``generic_implicit.py:51-103``) is elementwise over the modes:

  f_m = lam * u_m                    (eval_f)
  integral = dt (Q - QI) f + u0 + tau
  u_m <- (integral_m + dt sum_{j<m} QI_mj f_j) / (1 - dt QI_mm lam)

so k sweeps need exactly one forward transform, k * O(M^2) fused
elementwise passes, and one backward transform — instead of 2k*M FFTs for
the generic path (each node solve is transform/divide/transform).  On TPU
this turns the sustained-sweep hot loop from FFT-bound into pure
HBM-streaming VPU work: the speed-of-light path for the north-star metric.

This is the spatial mirror of ParaDiag's diagonalization in time
(reference ParaDiagSweepers.py:53-69) and plays the role of the
reference's cached ``splu`` factorizations (generic_ND_FD.py:208-240):
exploit structure once, then make every subsequent sweep cheap.

The result is mathematically identical to looping
``GenericImplicit.update_nodes`` (gated in tests/test_diag_sdc.py to
float64 roundoff); controllers use it transparently through
``Sweeper.update_nodes_k`` whenever the problem advertises
``diagonalizable_operator``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.state import LevelState
from pysdc_tpu.ops.qdelta import is_diagonal


def _bcast_nodes(v, lam_ndim, dtype):
    """(M,) node coefficients -> (M, 1, ..., 1) broadcastable over modes.

    ``dtype`` pins the coefficient precision to the state's real dtype —
    numpy-default f64 coefficients would otherwise promote complex64
    states to complex128 under x64 (breaking loop-carry typing)."""
    return jnp.reshape(jnp.asarray(v, dtype), (-1,) + (1,) * lam_ndim)


def _one_sweep_diag(uhat, lam, dt, q, QI, tauhat):
    """One generic-implicit sweep on basis coefficients uhat (M+1, *modes)."""
    M = q.shape[0]
    rdt = jnp.real(uhat).dtype
    fhat = lam * uhat
    W = jnp.asarray(q - QI[1:, 1:], rdt)
    integral = dt * jnp.tensordot(W, fhat[1:], axes=(1, 0)) + uhat[0][None] + tauhat

    if is_diagonal(QI):
        qd = _bcast_nodes(np.diag(QI)[1:], lam.ndim, rdt)
        unew = integral / (1.0 - dt * qd * lam)
    else:
        us = []
        for m in range(M):
            rhs = integral[m]
            for j in range(1, m + 1):
                if QI[m + 1, j] != 0.0:
                    # float(): numpy scalars are strong-typed and would
                    # promote complex64 states to complex128 under x64
                    rhs = rhs + (dt * float(QI[m + 1, j])) * (lam * us[j - 1])
            alpha = float(QI[m + 1, m + 1])
            us.append(rhs if alpha == 0.0 else rhs / (1.0 - dt * alpha * lam))
        unew = jnp.stack(us, axis=0)
    return jnp.concatenate([uhat[:1], unew], axis=0)


def diagonal_sweeps(op, sweeper, state: LevelState, t, dt, n_sweeps: int, k0: int = 0) -> LevelState:
    """Run ``n_sweeps`` generic-implicit sweeps entirely in ``op``'s diagonal
    basis and return the updated real-space :class:`LevelState`.

    ``op`` must expose ``diag_symbol`` / ``diag_forward`` / ``diag_backward``
    (SeparableFDOperator, SpectralOperator).  ``k0`` is the starting sweep
    index for k-dependent preconditioners (MIN-SR-FLEX).
    """
    real = not jnp.iscomplexobj(state.u)
    uhat = op.diag_forward(state.u)
    sym = op.diag_symbol
    lam_dt = jnp.real(uhat).dtype
    if np.iscomplexobj(sym):
        lam_dt = jnp.promote_types(lam_dt, jnp.complex64)
    lam = jnp.asarray(sym, lam_dt)  # match the state precision, don't promote
    tauhat = op.diag_forward(state.tau)
    q = sweeper.coll.q

    if getattr(sweeper, 'k_dependent', False):
        for k in range(k0, k0 + n_sweeps):
            uhat = _one_sweep_diag(uhat, lam, dt, q, sweeper._qi(k), tauhat)
    else:
        QI = sweeper._qi(k0)
        uhat = jax.lax.fori_loop(
            0, n_sweeps, lambda i, x: _one_sweep_diag(x, lam, dt, q, QI, tauhat), uhat
        )

    u = op.diag_backward(uhat, state.u.dtype, real)
    f = op.diag_backward(lam * uhat, state.f.dtype, real)
    return LevelState(u=u, f=f, tau=state.tau)
