"""Collocation-table tests, mirroring the reference's strategy
(``pySDC/tests/test_collocation.py``): exact polynomial integration at the
advertised order, Q/S summation identity, and partial quadrature with Q and S.
"""

import numpy as np
import pytest

from pysdc_tpu.ops.collocation import get_collocation

T_START = 0.1387
T_END = 0.9461

NODE_TYPES = ['EQUID', 'LEGENDRE', 'CHEBY-1', 'CHEBY-2', 'CHEBY-3', 'CHEBY-4']
QUAD_TYPES = ['GAUSS', 'LOBATTO', 'RADAU-RIGHT', 'RADAU-LEFT']
TOL = 1e-12


def _random_poly(rng, degree):
    return rng.random(degree + 1)


@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('M', range(2, 13))
def test_can_integrate_polynomials(M, node_type, quad_type):
    coll = get_collocation(M, node_type, quad_type, T_START, T_END)
    assert coll.nodes.size == M == coll.weights.size
    assert np.all(np.diff(coll.nodes) > 0), 'nodes not sorted/distinct'
    assert coll.tleft <= coll.nodes[0] and coll.nodes[-1] <= coll.tright

    rng = np.random.default_rng(42)
    poly = _random_poly(rng, coll.order - 1)
    vals = np.polyval(poly, coll.nodes)
    anti = np.polyint(poly)
    exact = np.polyval(anti, T_END) - np.polyval(anti, T_START)
    approx = np.dot(coll.weights, vals)
    assert abs(exact - approx) < TOL, f'order {coll.order} violated: err={abs(exact - approx):.3e}'


@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('M', range(2, 13))
def test_relate_Q_and_S(M, node_type, quad_type):
    coll = get_collocation(M, node_type, quad_type, T_START, T_END)
    Q, S = coll.q, coll.s
    assert Q.shape == S.shape == (M, M)
    SSum = np.cumsum(S, axis=0)
    assert np.allclose(Q, SSum, atol=1e-14), 'Q rows are not cumulative sums of S rows'


@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('M', range(2, 13))
def test_partial_quadrature_with_Q(M, node_type, quad_type):
    coll = get_collocation(M, node_type, quad_type, T_START, T_END)
    rng = np.random.default_rng(7)
    degree = min(coll.order, M - 1)
    poly = _random_poly(rng, degree - 1)
    vals = np.polyval(poly, coll.nodes)
    anti = np.polyint(poly)
    for m in range(M):
        exact = np.polyval(anti, coll.nodes[m]) - np.polyval(anti, T_START)
        approx = np.dot(coll.q[m], vals)
        assert abs(exact - approx) < TOL


@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('M', range(2, 13))
def test_partial_quadrature_with_S(M, node_type, quad_type):
    coll = get_collocation(M, node_type, quad_type, T_START, T_END)
    rng = np.random.default_rng(11)
    degree = min(coll.order, M - 1)
    poly = _random_poly(rng, degree - 1)
    vals = np.polyval(poly, coll.nodes)
    anti = np.polyint(poly)
    prev = T_START
    for m in range(M):
        exact = np.polyval(anti, coll.nodes[m]) - np.polyval(anti, prev)
        approx = np.dot(coll.s[m], vals)
        assert abs(exact - approx) < TOL
        prev = coll.nodes[m]


@pytest.mark.parametrize('quad_type', QUAD_TYPES)
def test_endpoint_flags_and_deltas(quad_type):
    coll = get_collocation(5, 'LEGENDRE', quad_type, 0.0, 1.0)
    assert coll.left_is_node == (quad_type in ('LOBATTO', 'RADAU-LEFT'))
    assert coll.right_is_node == (quad_type in ('LOBATTO', 'RADAU-RIGHT'))
    if coll.left_is_node:
        assert coll.nodes[0] == 0.0
    if coll.right_is_node:
        assert coll.nodes[-1] == 1.0
    assert np.allclose(np.cumsum(coll.delta_m), coll.nodes - coll.tleft)


def test_gauss_legendre_nodes_match_scipy():
    from scipy.special import roots_legendre

    for M in (2, 3, 5, 8):
        coll = get_collocation(M, 'LEGENDRE', 'GAUSS', -1.0, 1.0)
        x, w = roots_legendre(M)
        assert np.allclose(coll.nodes, x, atol=1e-13)
        assert np.allclose(coll.weights, w, atol=1e-13)


def test_cheby1_gauss_closed_form():
    M = 6
    coll = get_collocation(M, 'CHEBY-1', 'GAUSS', -1.0, 1.0)
    expect = np.sort(np.cos((2 * np.arange(1, M + 1) - 1) * np.pi / (2 * M)))
    assert np.allclose(coll.nodes, expect, atol=1e-13)


def test_bad_parameters_raise():
    with pytest.raises(ValueError):
        get_collocation(0, 'LEGENDRE', 'GAUSS')
    with pytest.raises(ValueError):
        get_collocation(3, 'NOPE', 'GAUSS')
    with pytest.raises(ValueError):
        get_collocation(3, 'LEGENDRE', 'NOPE')
    with pytest.raises(ValueError):
        get_collocation(3, 'LEGENDRE', 'GAUSS', 1.0, 0.0)


def test_non_legendre_orders_match_closed_forms():
    """The monomial-exactness probe returns the known analytic orders:
    interpolatory rules have order >= M; midpoint-symmetric node sets
    (EQUID, CHEBY families) gain one degree for odd M; M=3 EQUID/LOBATTO is
    Simpson's rule (order 4)."""
    from pysdc_tpu.ops.collocation import get_collocation

    assert get_collocation(3, 'EQUID', 'LOBATTO').order == 4  # Simpson
    assert get_collocation(2, 'EQUID', 'LOBATTO').order == 2  # trapezoid
    for M in range(2, 7):
        for node_type in ('EQUID', 'CHEBY-1', 'CHEBY-2'):
            coll = get_collocation(M, node_type, 'LOBATTO')
            expect = M + 1 if M % 2 == 1 else M  # symmetry bonus for odd M
            assert coll.order == expect, (node_type, M, coll.order)
        # one-sided Radau rules: no symmetry, interpolatory order M...
        coll = get_collocation(M, 'EQUID', 'RADAU-RIGHT')
        assert coll.order >= M, ('EQUID RADAU-RIGHT', M, coll.order)
