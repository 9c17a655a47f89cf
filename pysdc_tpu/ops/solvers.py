"""Iterative solvers for implicit PDE systems, jit-native.

The reference solves nonlinear implicit systems with per-problem Newton loops
around scipy sparse LU (e.g. AllenCahn_1D_FD.py:112-196).  Here the common
structure ``u - factor*(A u + g(u)) = rhs`` gets one shared TPU-native
Newton-Krylov solver:

  - each Newton step solves ``(I - factor*A - factor*diag(g'(u))) x = G``
    with preconditioned CG, using the operator's *exact* fast direct solve
    ``(I - factor*A)^{-1}`` as the preconditioner — typically 2-5 CG
    iterations, all matmuls/FFTs/elementwise, zero host round-trips;
  - the outer loop is a ``lax.while_loop`` on the residual norm, so the
    whole solve stays inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(matvec, b, x0, M_inv=None, tol=1e-12, maxiter=100):
    """Preconditioned conjugate gradient, traced (lax.while_loop)."""
    if M_inv is None:
        M_inv = lambda x: x

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, z, p, rz_new, it + 1

    def cond(carry):
        _, r, _, _, _, it = carry
        return jnp.logical_and(jnp.linalg.norm(r.ravel()) > tol, it < maxiter)

    r0 = b - matvec(x0)
    z0 = M_inv(r0)
    carry = (x0, r0, z0, z0, jnp.vdot(r0, z0), jnp.zeros((), jnp.int32))
    x, *_ = jax.lax.while_loop(cond, body, carry)
    return x


def newton_pde(apply_A, solve_shifted, g, gprime, rhs, factor, u0, *, newton_tol=1e-11,
               newton_maxiter=50, lin_tol=1e-13, lin_maxiter=50):
    """Solve ``u - factor*(A u + g(u)) = rhs``.

    Parameters
    ----------
    apply_A / solve_shifted:
        the linear operator and its exact shifted inverse (preconditioner).
    g / gprime:
        pointwise nonlinearity and its derivative.
    """

    def G(u):
        return u - factor * (apply_A(u) + g(u)) - rhs

    def newton_body(carry):
        u, it, res = carry
        dg = gprime(u)

        def J(x):
            return x - factor * (apply_A(x) + dg * x)

        def M_inv(x):
            return solve_shifted(x, factor)

        du = pcg(J, G(u), jnp.zeros_like(u), M_inv=M_inv, tol=lin_tol, maxiter=lin_maxiter)
        u_new = u - du
        return u_new, it + 1, jnp.max(jnp.abs(G(u_new)))

    def newton_cond(carry):
        _, it, res = carry
        return jnp.logical_and(res > newton_tol, it < newton_maxiter)

    res0 = jnp.max(jnp.abs(G(u0)))
    u, _, _ = jax.lax.while_loop(newton_cond, newton_body, (u0, jnp.zeros((), jnp.int32), res0))
    return u
