"""Small nonlinear ODE models.

Counterparts of the reference's ODE toy problems
(``implementations/problem_classes/``: Lorenz.py, Van_der_Pol_implicit.py,
LogisticEquation.py, AuzingerImplicit.py, odeScalar.py, odeSystem.py).  All
implicit solves use a shared jit-friendly Newton iteration with the exact
Jacobian obtained by ``jax.jacfwd`` inside a ``lax.while_loop`` — the
TPU-native version of the hand-rolled Newton loops the reference writes per
problem (e.g. Lorenz.py:109-191).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.problem import Problem, WorkCounter


def newton_solve(f, rhs, factor, u0, tol, maxiter):
    """Solve ``u - factor * f(u) = rhs`` with Newton; u flat 1-D or scalar.

    Fully traced: runs inside jit, tolerance loop via ``lax.while_loop``.
    """
    shape = u0.shape
    n = int(np.prod(shape)) if shape else 1

    def g(u_flat):
        u = u_flat.reshape(shape)
        return (u - factor * f(u) - rhs).ravel()

    jac = jax.jacfwd(g)

    def cond(carry):
        u_flat, it, res = carry
        return jnp.logical_and(res > tol, it < maxiter)

    def body(carry):
        u_flat, it, _ = carry
        G = g(u_flat)
        J = jac(u_flat)
        du = jnp.linalg.solve(J, G)
        u_new = u_flat - du
        return u_new, it + 1, jnp.linalg.norm(g(u_new))

    u0_flat = u0.ravel()
    res0 = jnp.linalg.norm(g(u0_flat))
    u_flat, _, _ = jax.lax.while_loop(cond, body, (u0_flat, jnp.zeros((), jnp.int32), res0))
    return u_flat.reshape(shape)


class NewtonODE(Problem):
    """Base for small ODE systems solved implicitly via Newton."""

    def __init__(self, shape, newton_tol=1e-9, newton_maxiter=99, dtype=None):
        super().__init__(shape=shape, dtype=dtype)
        self._register(newton_tol=newton_tol, newton_maxiter=newton_maxiter)
        self.work_counters['newton'] = WorkCounter()
        self.work_counters['rhs'] = WorkCounter()

    def solve_system(self, rhs, factor, u0, t):
        self.work_counters['newton']()
        return newton_solve(
            lambda u: self.eval_f(u, t), rhs, factor, u0, self.newton_tol, self.newton_maxiter
        )

    def solve_jacobian(self, rhs, factor, u=None, t=0.0):
        """(I - factor * J(u)) x = rhs with a dense (possibly complex)
        Jacobian — the ParaDiag inner solve for small ODE systems."""
        u = jnp.zeros(self.shape, self.dtype) if u is None else u
        J = jax.jacfwd(lambda v: self.eval_f(v, t))(u.real if jnp.iscomplexobj(u) else u)
        n = rhs.size
        A = jnp.eye(n, dtype=rhs.dtype) - factor * J.reshape(n, n).astype(rhs.dtype)
        return jnp.linalg.solve(A, rhs.ravel()).reshape(rhs.shape)


class Lorenz(NewtonODE):
    """Lorenz attractor (reference Lorenz.py:7)."""

    def __init__(self, sigma=10.0, rho=28.0, beta=8.0 / 3.0, u0=(1, 1, 1), newton_tol=1e-9, newton_maxiter=99, dtype=None):
        super().__init__((3,), newton_tol, newton_maxiter, dtype)
        self._register(sigma=sigma, rho=rho, beta=beta, u0=u0)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return jnp.stack(
            [
                self.sigma * (u[1] - u[0]),
                self.rho * u[0] - u[1] - u[0] * u[2],
                u[0] * u[1] - self.beta * u[2],
            ]
        )

    def u_exact(self, t, u_init=None, t_init=0.0):
        u_init = jnp.asarray(self.u0, self.dtype) if u_init is None else u_init
        if float(t) == float(t_init):
            return u_init
        return self.generate_scipy_reference_solution(
            lambda tt, u: np.asarray(self.eval_f(jnp.asarray(u), tt)), t, u_init, t_init
        )


class VanDerPol(NewtonODE):
    """Van der Pol oscillator, implicit (reference Van_der_Pol_implicit.py)."""

    def __init__(self, u0=(2.0, 0.0), mu=5.0, newton_tol=1e-9, newton_maxiter=100, dtype=None):
        super().__init__((2,), newton_tol, newton_maxiter, dtype)
        self._register(u0=u0, mu=mu)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return jnp.stack([u[1], self.mu * (1 - u[0] ** 2) * u[1] - u[0]])

    def u_exact(self, t, u_init=None, t_init=0.0):
        u_init = jnp.asarray(self.u0, self.dtype) if u_init is None else u_init
        if float(t) == float(t_init):
            return u_init
        return self.generate_scipy_reference_solution(
            lambda tt, u: np.asarray(self.eval_f(jnp.asarray(u), tt)), t, u_init, t_init
        )


class Logistic(NewtonODE):
    """Logistic growth u' = lam * u * (1 - u) (reference LogisticEquation.py)."""

    def __init__(self, u0=0.5, lam=1.0, newton_tol=1e-12, newton_maxiter=100, dtype=None):
        super().__init__((1,), newton_tol, newton_maxiter, dtype)
        self._register(u0=u0, lam=lam)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return self.lam * u * (1.0 - u)

    def u_exact(self, t, u_init=None, t_init=0.0):
        u0 = self.u0 if u_init is None else u_init
        return jnp.full(self.shape, u0 * jnp.exp(self.lam * (t - t_init)) / (1 - u0 + u0 * jnp.exp(self.lam * (t - t_init))), self.dtype)


class Auzinger(NewtonODE):
    """Auzinger test system with exact circular solution
    (reference AuzingerImplicit.py): u = (cos t, sin t)."""

    def __init__(self, newton_tol=1e-12, newton_maxiter=100, dtype=None):
        super().__init__((2,), newton_tol, newton_maxiter, dtype)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        z = u[0] ** 2 + u[1] ** 2 - 1
        return jnp.stack([-u[1] + u[0] * z, u[0] + 3 * u[1] * z])

    def u_exact(self, t, u_init=None, t_init=0.0):
        return jnp.stack([jnp.cos(t), jnp.sin(t)]).astype(self.dtype)


class DiscontinuousTestODE(NewtonODE):
    """Scalar ODE with one discrete event at t* = log(5)
    (reference DiscontinuousTestODE.py): u' = u while u < 5, then u' = 4/t*.
    Exact: u = exp(t) for t <= t*, u = 4 t / t* + 1 after."""

    t_star = float(np.log(5.0))

    def __init__(self, newton_tol=1e-12, newton_maxiter=100, dtype=None):
        super().__init__((1,), newton_tol, newton_maxiter, dtype)
        self._register(t_switch=np.inf, nswitches=0)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        switched = jnp.logical_or(u[0] - 5.0 >= 0, t >= self.t_switch)
        return jnp.where(switched, 4.0 / self.t_star * jnp.ones_like(u), u)

    def solve_system(self, rhs, factor, u0, t):
        self.work_counters['newton']()
        switched = jnp.logical_or(rhs[0] - 5.0 >= 0, t >= self.t_switch)
        u_smooth = rhs / (1.0 - factor)
        u_switched = rhs + factor * 4.0 / self.t_star
        return jnp.where(switched, u_switched, u_smooth)

    def u_exact(self, t, u_init=None, t_init=0.0):
        t_star = self.t_star
        val = jnp.where(t <= t_star, jnp.exp(t), 4.0 * t / t_star + 1.0)
        return jnp.full((1,), val, self.dtype)

    def get_switching_info(self, u_nodes, t):
        u_nodes = [np.asarray(u) for u in u_nodes]
        switch_detected, m_guess = False, -100
        for m in range(1, len(u_nodes)):
            if u_nodes[m - 1][0] - 5.0 < 0 and u_nodes[m][0] - 5.0 >= 0:
                switch_detected = True
                m_guess = m - 1
                break
        state_function = [float(u[0] - 5.0) for u in u_nodes]
        return switch_detected, m_guess, state_function

    def count_switches(self):
        self.nswitches += 1


class ProtheroRobinson(NewtonODE):
    """Classic stiff Prothero-Robinson problem
    (reference parallelSDC_reloaded/protheroRobinson): u' = -(u - g(t))/eps + g'(t),
    exact solution u = g(t) = cos(t)."""

    def __init__(self, epsilon=1e-3, newton_tol=1e-12, newton_maxiter=100, dtype=None):
        super().__init__((1,), newton_tol, newton_maxiter, dtype)
        self._register(epsilon=epsilon)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return -(u - jnp.cos(t)) / self.epsilon - jnp.sin(t)

    def u_exact(self, t, u_init=None, t_init=0.0):
        return jnp.full((1,), jnp.cos(t), self.dtype)


class ProtheroRobinsonNonLinear(ProtheroRobinson):
    """Nonlinear Prothero-Robinson form (reference odeScalar.py:36,73-78 with
    ``nonLinear=True``): u' = -(u^3 - g(t)^3)/eps + g'(t), g = cos."""

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return -(u**3 - jnp.cos(t) ** 3) / self.epsilon - jnp.sin(t)


class ProtheroRobinsonAutonomous(NewtonODE):
    """Autonomous Prothero-Robinson (reference odeSystem.py:21-238): the time
    variable becomes a second component v with v' = 1; ``non_linear``
    selects the cubic form."""

    def __init__(self, epsilon=1e-3, non_linear=False, newton_tol=1e-12,
                 newton_maxiter=100, dtype=None):
        super().__init__((2,), newton_tol, newton_maxiter, dtype)
        self._register(epsilon=epsilon, non_linear=non_linear)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        x, v = u[0], u[1]
        g, dg = jnp.cos(v), -jnp.sin(v)
        if self.non_linear:
            fx = -(x**3 - g**3) / self.epsilon + dg
        else:
            fx = -(x - g) / self.epsilon + dg
        return jnp.stack([fx, jnp.ones_like(v)])

    def u_exact(self, t, u_init=None, t_init=0.0):
        return jnp.asarray([jnp.cos(t), t], self.dtype)


class Kaps(NewtonODE):
    """Kaps singular-perturbation problem (reference odeSystem.py:239-392):
    u' = -(2 + 1/eps) u + v^2/eps, v' = u - v(1+v); exact u = e^{-2t},
    v = e^{-t} independent of eps."""

    def __init__(self, epsilon=1e-3, newton_tol=5e-11, newton_maxiter=200, dtype=None):
        super().__init__((2,), newton_tol, newton_maxiter, dtype)
        self._register(epsilon=epsilon)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        x, y = u[0], u[1]
        return jnp.stack([-(2.0 + 1.0 / self.epsilon) * x + y**2 / self.epsilon,
                          x - y * (1.0 + y)])

    def u_exact(self, t, u_init=None, t_init=0.0):
        return jnp.asarray([jnp.exp(-2.0 * t), jnp.exp(-t)], self.dtype)


class ChemicalReaction3Var(NewtonODE):
    """Stiff 3-species chemical reaction (reference odeSystem.py:394-578,
    Van der Houwen & Sommeijer 1991); reference solution via scipy."""

    u0 = (0.990731920827, 1.009264413846, -0.366532612659e-5)

    def __init__(self, newton_tol=5e-11, newton_maxiter=200, dtype=None):
        super().__init__((3,), newton_tol, newton_maxiter, dtype)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        c1, c2, c3 = u[0], u[1], u[2]
        return -jnp.stack([
            0.013 * c1 + 1000.0 * c3 * c1,
            2500.0 * c3 * c2,
            0.013 * c1 + 1000.0 * c1 * c3 + 2500.0 * c2 * c3,
        ])

    def u_exact(self, t, u_init=None, t_init=0.0):
        if float(t) == 0.0:
            return jnp.asarray(self.u0, self.dtype)
        u_init = jnp.asarray(self.u0, self.dtype) if u_init is None else u_init
        return self.generate_scipy_reference_solution(
            lambda tt, u: np.asarray(self.eval_f(jnp.asarray(u), tt)), t, u_init, t_init
        )


class JacobiElliptic(NewtonODE):
    """Jacobi elliptic functions system (reference odeSystem.py:745-908):
    u' = vw, v' = -uw, w' = -0.51 uv with (0, 1, 1) start."""

    u0 = (0.0, 1.0, 1.0)

    def __init__(self, newton_tol=5e-11, newton_maxiter=200, dtype=None):
        super().__init__((3,), newton_tol, newton_maxiter, dtype)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        x, y, z = u[0], u[1], u[2]
        return jnp.stack([y * z, -x * z, -0.51 * x * y])

    def u_exact(self, t, u_init=None, t_init=0.0):
        if float(t) == 0.0:
            return jnp.asarray(self.u0, self.dtype)
        u_init = jnp.asarray(self.u0, self.dtype) if u_init is None else u_init
        return self.generate_scipy_reference_solution(
            lambda tt, u: np.asarray(self.eval_f(jnp.asarray(u), tt)), t, u_init, t_init
        )


class NonlinearODE1(NewtonODE):
    """u' = sqrt(1 - u), u(0) = 0, exact u = t - t^2/4 — derivative singular
    at u = 1 (reference nonlinear_ODE_1.py:9-124)."""

    def __init__(self, u0=0.0, newton_tol=5e-11, newton_maxiter=200, dtype=None):
        super().__init__((1,), newton_tol, newton_maxiter, dtype)
        self._register(u0=u0)

    def eval_f(self, u, t):
        self.work_counters['rhs']()
        return jnp.sqrt(jnp.maximum(1.0 - u, 0.0))

    def u_exact(self, t, u_init=None, t_init=0.0):
        return jnp.full((1,), t - t**2 / 4.0, self.dtype)


class PolynomialTestEquation(Problem):
    """Dummy problem whose solution is a random-coefficient polynomial of
    ``t`` and whose ``solve_system`` returns the exact solution — for testing
    operations that are exact on polynomials, e.g. collocation transfer and
    polynomial error estimation (reference polynomial_test_problem.py:7-101)."""

    def __init__(self, degree=1, seed=26266, dtype=None):
        super().__init__(shape=(1,), dtype=dtype)
        self._register(degree=degree, seed=seed)
        rng = np.random.RandomState(seed=seed)
        self.coeffs = rng.rand(degree)
        self.poly = np.polynomial.Polynomial(self.coeffs)
        self.dpoly = self.poly.deriv(m=1)

    def eval_f(self, u, t):
        return jnp.full((1,), jnp.polyval(jnp.asarray(self.dpoly.coef[::-1]), t), self.dtype)

    def solve_system(self, rhs, factor, u0, t):
        return self.u_exact(t)

    def u_exact(self, t, u_init=None, t_init=0.0):
        return jnp.full((1,), jnp.polyval(jnp.asarray(self.poly.coef[::-1]), t), self.dtype)


class PolynomialTestEquationIMEX(PolynomialTestEquation):
    """IMEX split: half the derivative implicit, half explicit
    (reference polynomial_test_problem.py:102-124)."""

    f_kind = 'imex'

    def eval_f(self, u, t):
        from pysdc_tpu.core.state import IMEX

        d = jnp.full((1,), jnp.polyval(jnp.asarray(self.dpoly.coef[::-1]), t), self.dtype)
        return IMEX(impl=d / 2.0, expl=d / 2.0)
