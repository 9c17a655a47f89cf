"""Runge-Kutta methods as one-sweep "sweepers".

Counterpart of the reference ``RungeKutta`` / ``RungeKuttaIMEX`` family
(``implementations/sweeper_classes/Runge_Kutta.py:10-819``): a lower
triangular Butcher tableau plays the role of the collocation + QDelta pair,
stages are computed by forward substitution in a single sweep, and embedded
pairs expose a secondary (lower-order) end point for adaptivity.

All tableaus below are standard published methods; every one is gated by an
empirical convergence-order test in ``tests/test_runge_kutta.py`` — a wrong
coefficient shows up immediately as a broken order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ParameterError
from pysdc_tpu.core.state import IMEX, LevelState, f_total
from pysdc_tpu.core.sweeper import Sweeper


class ButcherTableau:
    """Lower-triangular Butcher tableau exposing the slice of the collocation
    interface the framework uses (reference Runge_Kutta.py:10-77)."""

    def __init__(self, weights, nodes, matrix):
        self.check_method(weights, nodes, matrix)
        self.tleft = 0.0
        self.tright = 1.0
        self.num_nodes = matrix.shape[0]
        self.weights = np.asarray(weights, dtype=float)

        self.nodes = np.append([0], nodes).astype(float)
        self.Qmat = np.zeros([self.num_nodes + 1, self.num_nodes + 1])
        self.Qmat[1:, 1:] = matrix

        self.left_is_node = True
        self.right_is_node = self.nodes[-1] == self.tright
        self.node_type = 'BUTCHER'
        self.quad_type = 'BUTCHER'

        if self.num_nodes > 1:
            self.delta_m = self.nodes[1:] - self.nodes[:-1]
        else:
            self.delta_m = np.zeros(1)
        self.delta_m[0] = self.nodes[1] - self.tleft

        self.implicit = any(matrix[i, i] != 0 for i in range(self.num_nodes))

    def check_method(self, weights, nodes, matrix):
        if not isinstance(matrix, np.ndarray):
            raise ParameterError('Runge-Kutta matrix needs to be supplied as a numpy array!')
        if len(np.unique(matrix.shape)) != 1 or len(matrix.shape) != 2:
            raise ParameterError('Runge-Kutta matrix needs to be a square 2D numpy array!')
        if not isinstance(nodes, np.ndarray):
            raise ParameterError('Nodes need to be supplied as a numpy array!')
        if len(nodes.shape) != 1 or len(nodes) != matrix.shape[0]:
            raise ParameterError(f'Incompatible nodes for {matrix.shape[0]}-stage method')
        if np.any(np.triu(matrix, k=1) != 0):
            raise ParameterError('only lower-triangular (DIRK-type) tableaus are supported')
        self.check_weights(weights, nodes, matrix)

    def check_weights(self, weights, nodes, matrix):
        if not isinstance(weights, np.ndarray) or len(weights.shape) != 1 or len(weights) != matrix.shape[0]:
            raise ParameterError(f'Incompatible weights for {matrix.shape[0]}-stage method')

    @property
    def q(self):
        return self.Qmat[1:, 1:]

    @property
    def globally_stiffly_accurate(self):
        return np.allclose(self.Qmat[-1, 1:], self.weights)


class ButcherTableauEmbedded(ButcherTableau):
    """weights has two rows: [main, embedded] (reference Runge_Kutta.py:78)."""

    def check_weights(self, weights, nodes, matrix):
        if not isinstance(weights, np.ndarray) or len(weights.shape) != 2 or weights.shape[1] != matrix.shape[0]:
            raise ParameterError(f'Embedded weights need shape (2, {matrix.shape[0]})')

    @property
    def globally_stiffly_accurate(self):
        return np.allclose(self.Qmat[-1, 1:], self.weights[0])


class RungeKutta(Sweeper):
    """Base RK sweeper; subclasses define nodes/weights/matrix class attrs."""

    nodes: np.ndarray = None
    weights: np.ndarray = None
    matrix: np.ndarray = None
    ButcherTableauClass = ButcherTableau

    #: RK methods are direct solvers: residual/restol logic is bypassed
    is_direct_solver = True

    def __init__(self, params: dict):
        params = dict(params)
        self.coll = self.get_Butcher_tableau()
        self.params = params
        self.initial_guess = 'zero'
        self.random_seed = 1984
        self._rng = np.random.RandomState(self.random_seed)
        self.skip_residual_computation = tuple(
            params.get('skip_residual_computation', ('IT_CHECK', 'IT_FINE', 'IT_COARSE', 'IT_UP', 'IT_DOWN'))
        )
        self.do_coll_update = False
        self.parallelizable = False
        self.QI = self.coll.Qmat

    @classmethod
    def get_Butcher_tableau(cls):
        return cls.ButcherTableauClass(cls.weights, cls.nodes, cls.matrix)

    @classmethod
    def get_update_order(cls):
        """Order of the embedded (update) scheme, for AdaptivityRK."""
        raise NotImplementedError(
            f'There is no update order for RK scheme {cls.__name__!r}. Maybe it is not embedded?'
        )

    @classmethod
    def is_embedded(cls):
        return cls.ButcherTableauClass == ButcherTableauEmbedded

    @property
    def k_dependent(self):
        return False

    # -- protocol -------------------------------------------------------
    def predict(self, prob, u0, t, dt, random_val: float = 0.0) -> LevelState:
        M = self.coll.num_nodes
        f0 = prob.eval_f(u0, t)
        u_nodes = jnp.zeros((M,) + u0.shape, u0.dtype)
        f_nodes = jax.tree_util.tree_map(lambda leaf: jnp.zeros((M,) + leaf.shape, leaf.dtype), f0)
        u = jnp.concatenate([u0[None], u_nodes], axis=0)
        f = jax.tree_util.tree_map(lambda l0, ln: jnp.concatenate([l0[None], ln], axis=0), f0, f_nodes)
        tau = jnp.zeros((M,) + u0.shape, u0.dtype)
        return LevelState(u=u, f=f, tau=tau)

    def integrate(self, state: LevelState, dt):
        ft = f_total(state.f)[1:]
        return dt * jnp.tensordot(jnp.asarray(self.coll.q, ft.dtype), ft, axes=(1, 0))

    def _stage_rhs_terms(self, m, f_list, dt):
        """Sum of dt*A[m,j]*f_j for the already-computed stages j <= m."""
        terms = 0.0
        for j in range(1, m + 1):
            if self.QI[m + 1, j] != 0.0:
                terms = terms + dt * self.QI[m + 1, j] * f_total(f_list[j])
        return terms

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        u_list = [state.u[m] for m in range(M + 1)]
        f_list = [jax.tree_util.tree_map(lambda leaf: leaf[m], state.f) for m in range(M + 1)]

        for m in range(M):
            rhs = u_list[0] + self._stage_rhs_terms(m, f_list, dt)
            t_stage = t + dt * self.coll.nodes[m + 1]
            if self.QI[m + 1, m + 1] != 0.0:
                u_list[m + 1] = prob.solve_system(rhs, dt * self.QI[m + 1, m + 1], u_list[m], t_stage)
            else:
                u_list[m + 1] = rhs
            if m < M - 1 or not self.coll.globally_stiffly_accurate or self.is_embedded():
                f_list[m + 1] = prob.eval_f(u_list[m + 1], t_stage)

        u = jnp.stack(u_list, axis=0)
        f = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves, axis=0), *f_list)
        return LevelState(u=u, f=f, tau=state.tau)

    def compute_end_point(self, state: LevelState, t, dt):
        uend, _ = self.compute_end_point_with_secondary(state, t, dt)
        return uend

    def compute_end_point_with_secondary(self, state: LevelState, t, dt):
        """(uend, u_secondary) — secondary is the embedded lower-order result
        (reference Runge_Kutta.py:277-302)."""
        ft = f_total(state.f)[1:]
        u0 = state.u[0]
        secondary = None
        if self.coll.globally_stiffly_accurate:
            uend = state.u[-1]
            if self.is_embedded():
                w2 = jnp.asarray(self.coll.weights[1], ft.dtype)
                secondary = u0 + dt * jnp.tensordot(w2, ft, axes=(0, 0))
        else:
            if self.is_embedded():
                w1 = jnp.asarray(self.coll.weights[0], ft.dtype)
                w2 = jnp.asarray(self.coll.weights[1], ft.dtype)
                uend = u0 + dt * jnp.tensordot(w1, ft, axes=(0, 0))
                secondary = u0 + dt * jnp.tensordot(w2, ft, axes=(0, 0))
            else:
                w = jnp.asarray(self.coll.weights, ft.dtype)
                uend = u0 + dt * jnp.tensordot(w, ft, axes=(0, 0))
        return uend, secondary


class RungeKuttaIMEX(RungeKutta):
    """IMEX split RK: implicit tableau for f.impl, explicit for f.expl.
    Both parts must share nodes and weights (reference Runge_Kutta.py:346)."""

    matrix_explicit: np.ndarray = None
    weights_explicit: np.ndarray = None

    def __init__(self, params: dict):
        super().__init__(params)
        type(self).weights_explicit = (
            self.weights if type(self).weights_explicit is None else type(self).weights_explicit
        )
        self.coll_explicit = self.get_Butcher_tableau_explicit()
        self.QE = self.coll_explicit.Qmat

    @classmethod
    def get_Butcher_tableau_explicit(cls):
        weights = cls.weights_explicit if cls.weights_explicit is not None else cls.weights
        return cls.ButcherTableauClass(weights, cls.nodes, cls.matrix_explicit)

    def predict(self, prob, u0, t, dt, random_val: float = 0.0) -> LevelState:
        state = super().predict(prob, u0, t, dt, random_val)
        return state

    def update_nodes(self, prob, state: LevelState, t, dt, k: int = 0) -> LevelState:
        M = self.coll.num_nodes
        u_list = [state.u[m] for m in range(M + 1)]
        f_list = [jax.tree_util.tree_map(lambda leaf: leaf[m], state.f) for m in range(M + 1)]

        for m in range(M):
            rhs = u_list[0]
            for j in range(1, m + 1):
                if self.QI[m + 1, j] != 0.0:
                    rhs = rhs + dt * self.QI[m + 1, j] * f_list[j].impl
                if self.QE[m + 1, j] != 0.0:
                    rhs = rhs + dt * self.QE[m + 1, j] * f_list[j].expl
            t_stage = t + dt * self.coll.nodes[m + 1]
            if self.QI[m + 1, m + 1] != 0.0:
                u_list[m + 1] = prob.solve_system(rhs, dt * self.QI[m + 1, m + 1], u_list[m], t_stage)
            else:
                u_list[m + 1] = rhs
            f_list[m + 1] = prob.eval_f(u_list[m + 1], t_stage)

        u = jnp.stack(u_list, axis=0)
        f = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves, axis=0), *f_list)
        return LevelState(u=u, f=f, tau=state.tau)

    def compute_end_point_with_secondary(self, state: LevelState, t, dt):
        fi = state.f.impl[1:]
        fe = state.f.expl[1:]
        u0 = state.u[0]
        if self.is_embedded():
            wi1 = jnp.asarray(self.coll.weights[0], fi.dtype)
            wi2 = jnp.asarray(self.coll.weights[1], fi.dtype)
            we1 = jnp.asarray(self.coll_explicit.weights[0], fe.dtype)
            we2 = jnp.asarray(self.coll_explicit.weights[1], fe.dtype)
            uend = u0 + dt * (jnp.tensordot(wi1, fi, axes=(0, 0)) + jnp.tensordot(we1, fe, axes=(0, 0)))
            secondary = u0 + dt * (jnp.tensordot(wi2, fi, axes=(0, 0)) + jnp.tensordot(we2, fe, axes=(0, 0)))
            return uend, secondary
        wi = jnp.asarray(self.coll.weights, fi.dtype)
        we = jnp.asarray(self.coll_explicit.weights, fe.dtype)
        uend = u0 + dt * (jnp.tensordot(wi, fi, axes=(0, 0)) + jnp.tensordot(we, fe, axes=(0, 0)))
        return uend, None


# ---------------------------------------------------------------------------
# Named methods (standard published tableaus; orders pinned by tests)
# ---------------------------------------------------------------------------


class ForwardEuler(RungeKutta):
    """Explicit Euler, order 1."""

    nodes = np.array([0.0])
    weights = np.array([1.0])
    matrix = np.array([[0.0]])


class BackwardEuler(RungeKutta):
    """Implicit Euler, order 1, stiffly accurate."""

    nodes = np.array([1.0])
    weights = np.array([1.0])
    matrix = np.array([[1.0]])


class CrankNicolson(RungeKutta):
    """Implicit trapezoidal rule, order 2."""

    nodes = np.array([0.0, 1.0])
    weights = np.array([0.5, 0.5])
    matrix = np.array([[0.0, 0.0], [0.5, 0.5]])


class ExplicitMidpointMethod(RungeKutta):
    """Explicit midpoint, order 2."""

    nodes = np.array([0.0, 0.5])
    weights = np.array([0.0, 1.0])
    matrix = np.array([[0.0, 0.0], [0.5, 0.0]])


class ImplicitMidpointMethod(RungeKutta):
    """Implicit midpoint (Gauss, 1 stage), order 2."""

    nodes = np.array([0.5])
    weights = np.array([1.0])
    matrix = np.array([[0.5]])


class RK4(RungeKutta):
    """The classic explicit fourth-order method."""

    nodes = np.array([0.0, 0.5, 0.5, 1.0])
    weights = np.array([1.0, 2.0, 2.0, 1.0]) / 6.0
    matrix = np.zeros((4, 4))
    matrix[1, 0] = 0.5
    matrix[2, 1] = 0.5
    matrix[3, 2] = 1.0


class Heun_Euler(RungeKutta):
    """Heun's second-order method with embedded Euler (order 2(1))."""

    nodes = np.array([0.0, 1.0])
    weights = np.array([[0.5, 0.5], [1.0, 0.0]])
    matrix = np.zeros((2, 2))
    matrix[1, 0] = 1.0
    ButcherTableauClass = ButcherTableauEmbedded

    @classmethod
    def get_update_order(cls):
        return 2


class Cash_Karp(RungeKutta):
    """Cash-Karp 5(4) embedded explicit pair (Cash & Karp 1990)."""

    nodes = np.array([0, 0.2, 0.3, 0.6, 1.0, 7.0 / 8.0])
    weights = np.array(
        [
            [37.0 / 378.0, 0.0, 250.0 / 621.0, 125.0 / 594.0, 0.0, 512.0 / 1771.0],
            [2825.0 / 27648.0, 0.0, 18575.0 / 48384.0, 13525.0 / 55296.0, 277.0 / 14336.0, 0.25],
        ]
    )
    matrix = np.zeros((6, 6))
    matrix[1, 0] = 1.0 / 5.0
    matrix[2, :2] = [3.0 / 40.0, 9.0 / 40.0]
    matrix[3, :3] = [0.3, -0.9, 1.2]
    matrix[4, :4] = [-11.0 / 54.0, 5.0 / 2.0, -70.0 / 27.0, 35.0 / 27.0]
    matrix[5, :5] = [
        1631.0 / 55296.0,
        175.0 / 512.0,
        575.0 / 13824.0,
        44275.0 / 110592.0,
        253.0 / 4096.0,
    ]
    ButcherTableauClass = ButcherTableauEmbedded

    @classmethod
    def get_update_order(cls):
        return 5


class CrouzeixDIRK4(RungeKutta):
    """Crouzeix's 3-stage DIRK of order 4 (A-stable).

    gamma = (1/sqrt(3)) cos(pi/18) + 1/2; delta = 1/(6 (2 gamma - 1)^2).
    Known as DIRK43 in the reference's naming (Runge_Kutta.py:626).
    """

    _gamma = np.cos(np.pi / 18.0) / np.sqrt(3.0) + 0.5
    _delta = 1.0 / (6.0 * (2.0 * _gamma - 1.0) ** 2)
    nodes = np.array([_gamma, 0.5, 1.0 - _gamma])
    weights = np.array([_delta, 1.0 - 2.0 * _delta, _delta])
    matrix = np.array(
        [
            [_gamma, 0.0, 0.0],
            [0.5 - _gamma, _gamma, 0.0],
            [2.0 * _gamma, 1.0 - 4.0 * _gamma, _gamma],
        ]
    )


DIRK43_2 = CrouzeixDIRK4


class ARK324L2SAESDIRK(RungeKutta):
    """Implicit (ESDIRK) part of Kennedy & Carpenter's ARK3(2)4L[2]SA
    (Appl. Numer. Math. 44, 2003) — order 3, stiffly accurate, embedded 2nd
    order weights."""

    _g = 1767732205903.0 / 4055673282236.0
    nodes = np.array([0.0, 2 * _g, 3.0 / 5.0, 1.0])
    _b = np.array(
        [
            1471266399579.0 / 7840856788654.0,
            -4482444167858.0 / 7529755066697.0,
            11266239266428.0 / 11593286722821.0,
            _g,
        ]
    )
    _bhat = np.array(
        [
            2756255671327.0 / 12835298489170.0,
            -10771552573575.0 / 22201958757719.0,
            9247589265047.0 / 10645013368117.0,
            2193209047091.0 / 5459859503100.0,
        ]
    )
    weights = np.array([_b, _bhat])
    matrix = np.zeros((4, 4))
    matrix[1, :2] = [_g, _g]
    matrix[2, :3] = [2746238789719.0 / 10658868560708.0, -640167445237.0 / 6845629431997.0, _g]
    matrix[3, :] = _b
    ButcherTableauClass = ButcherTableauEmbedded

    @classmethod
    def get_update_order(cls):
        return 3


class ARK324L2SAERK(RungeKutta):
    """Explicit part of Kennedy & Carpenter's ARK3(2)4L[2]SA — order 3."""

    _g = ARK324L2SAESDIRK._g
    nodes = ARK324L2SAESDIRK.nodes
    weights = ARK324L2SAESDIRK.weights
    matrix = np.zeros((4, 4))
    matrix[1, 0] = 2 * _g
    matrix[2, :2] = [5535828885825.0 / 10492691773637.0, 788022342437.0 / 10882634858940.0]
    matrix[3, :3] = [
        6485989280629.0 / 16251701735622.0,
        -4246266847089.0 / 9704473918619.0,
        10755448449292.0 / 10357097424841.0,
    ]
    ButcherTableauClass = ButcherTableauEmbedded

    @classmethod
    def get_update_order(cls):
        return 3


class ARK32(RungeKuttaIMEX):
    """Kennedy & Carpenter ARK3(2)4L[2]SA additive IMEX pair."""

    nodes = ARK324L2SAESDIRK.nodes
    weights = ARK324L2SAESDIRK.weights
    matrix = ARK324L2SAESDIRK.matrix
    matrix_explicit = ARK324L2SAERK.matrix
    ButcherTableauClass = ButcherTableauEmbedded

    @classmethod
    def get_update_order(cls):
        return 3


class IMEXEuler(RungeKuttaIMEX):
    """First-order IMEX Euler: implicit Euler for the stiff part, explicit
    Euler for the rest (reference Runge_Kutta.py:519)."""

    nodes = np.array([0.0, 1.0])
    weights = np.array([0.0, 1.0])
    matrix = np.zeros((2, 2))
    matrix[1, 1] = 1.0
    matrix_explicit = np.zeros((2, 2))
    matrix_explicit[1, 0] = 1.0


class IMEXEulerStifflyAccurate(RungeKuttaIMEX):
    """Stiffly accurate IMEX Euler: u = fI^{-1}(u0 + dt*fE(u0)) — the last
    stage is the solution, suitable for DAE limits
    (reference Runge_Kutta.py:527-540)."""

    nodes = np.array([0.0, 1.0])
    weights = np.array([0.0, 1.0])
    weights_explicit = np.array([1.0, 0.0])
    matrix = np.array([[0.0, 0.0], [0.0, 1.0]])
    matrix_explicit = np.array([[0.0, 0.0], [1.0, 0.0]])


class DIRK43_2(RungeKutta):
    """L-stable DIRK with four stages of order 3 (classic tableau, see the
    Wikipedia list of RK methods; reference Runge_Kutta.py:626-633)."""

    nodes = np.array([0.5, 2.0 / 3.0, 0.5, 1.0])
    weights = np.array([3.0 / 2.0, -3.0 / 2.0, 0.5, 0.5])
    matrix = np.array(
        [
            [0.5, 0.0, 0.0, 0.0],
            [1.0 / 6.0, 0.5, 0.0, 0.0],
            [-0.5, 0.5, 0.5, 0.0],
            [3.0 / 2.0, -3.0 / 2.0, 0.5, 0.5],
        ]
    )


def _embedded_weights_order3(A: np.ndarray, c: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-3 embedded weights for a given tableau: perturb b inside the
    null space of the order-{1,2,3} condition matrix, breaking one order-4
    condition so the pair is genuinely 4(3).  (The reference takes the
    published embedded weights from qmat; deriving them from the order
    conditions gives an equally valid order-3 companion and is pinned by the
    embedded-order test.)"""
    C = np.vstack([np.ones_like(c), c, c**2, A @ c])
    _, _, Vt = np.linalg.svd(C)
    null = Vt[4:]  # (s-4, s) basis of the nullspace
    # direction that maximally violates b.c^3 = 1/4 within the nullspace
    viol = null @ c**3
    d = null.T @ viol
    d = d / (d @ c**3)  # normalize: bhat.c^3 - 1/4 = -0.05
    return b - 0.05 * d


class ESDIRK43(RungeKutta):
    """ESDIRK4(3)6L[2]SA: stiffly accurate, L-stable, stage order 2,
    gamma = 1/4 (Kennedy & Carpenter, NASA/TM-2016-219173; reference
    Runge_Kutta.py:661-674).  Main weights are the published closed forms —
    verified against all eight order-4 conditions in tests."""

    _s2 = np.sqrt(2.0)
    _g = 0.25
    nodes = np.array([0.0, 0.5, (2.0 - _s2) / 4.0, 5.0 / 8.0, 26.0 / 25.0, 1.0])
    _b = np.array(
        [
            (1181.0 - 987.0 * _s2) / 13782.0,
            (1181.0 - 987.0 * _s2) / 13782.0,
            47.0 * (-267.0 + 1783.0 * _s2) / 273343.0,
            -16.0 * (-22922.0 + 3525.0 * _s2) / 571953.0,
            -15625.0 * (97.0 + 376.0 * _s2) / 90749876.0,
            _g,
        ]
    )
    matrix = np.zeros((6, 6))
    matrix[1, :2] = [_g, _g]
    matrix[2, :3] = [(1.0 - _s2) / 8.0, (1.0 - _s2) / 8.0, _g]
    matrix[3, :4] = [(5.0 - 7.0 * _s2) / 64.0, (5.0 - 7.0 * _s2) / 64.0, 7.0 * (1.0 + _s2) / 32.0, _g]
    matrix[4, :5] = [
        (-13796.0 - 54539.0 * _s2) / 125000.0,
        (-13796.0 - 54539.0 * _s2) / 125000.0,
        (506605.0 + 132109.0 * _s2) / 437500.0,
        166.0 * (-97.0 + 376.0 * _s2) / 109375.0,
        _g,
    ]
    matrix[5, :] = _b
    weights = np.array([_b, _embedded_weights_order3(matrix, nodes, _b)])
    ButcherTableauClass = ButcherTableauEmbedded

    @classmethod
    def get_update_order(cls):
        return 4
