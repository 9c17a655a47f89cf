"""QDelta preconditioner tests, mirroring the reference's
``pySDC/tests/test_sweepers/test_preconditioners.py``: structure and
nilpotency properties of every generator across node/quadrature families.
"""

import numpy as np
import pytest

from pysdc_tpu.ops.collocation import get_collocation
from pysdc_tpu.ops.qdelta import (
    is_diagonal,
    is_k_dependent,
    qdelta_explicit,
    qdelta_implicit,
)

NODE_TYPES = ['EQUID', 'LEGENDRE'] + [f'CHEBY-{i}' for i in [1, 2, 3, 4]]
QUAD_TYPES = ['GAUSS', 'LOBATTO', 'RADAU-RIGHT', 'RADAU-LEFT']
NUM_NODES = [2, 3, 4, 5]


def _coll(M, node_type, quad_type):
    return get_collocation(M, node_type, quad_type, 0.0, 1.0)


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_min_sr(node_type, quad_type, M):
    coll = _coll(M, node_type, quad_type)
    Q = coll.q

    # non-stiff limit: Q - QDelta nilpotent
    QDelta = qdelta_implicit(coll, 'MIN-SR-NS')[1:, 1:]
    assert np.all(np.diag(np.diag(QDelta)) == QDelta), 'QDelta not diagonal'
    K = Q - QDelta
    nilpotency = np.linalg.norm(np.linalg.matrix_power(K, M), ord=np.inf)
    assert nilpotency < 1e-10, f'Q-QDelta not nilpotent (M={M}, norm={nilpotency})'

    # stiff limit: I - QDelta^{-1} Q nilpotent
    QDelta = qdelta_implicit(coll, 'MIN-SR-S')[1:, 1:]
    assert np.all(np.diag(np.diag(QDelta)) == QDelta), 'QDelta not diagonal'
    if quad_type in ['LOBATTO', 'RADAU-LEFT']:
        Dinv = np.diag(1 / np.diag(QDelta[1:, 1:]))
        Qr = Q[1:, 1:]
    else:
        Dinv = np.diag(1 / np.diag(QDelta))
        Qr = Q
    K = np.eye(Qr.shape[0]) - Dinv @ Qr
    nilpotency = np.linalg.norm(np.linalg.matrix_power(K, M), ord=np.inf)
    assert nilpotency < 1e-10, f'I-QDelta^-1 Q not nilpotent (M={M}, norm={nilpotency})'


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_min_sr_flex(node_type, quad_type, M):
    coll = _coll(M, node_type, quad_type)
    start_idx = 1 + (1 if coll.nodes[0] == 0 else 0)
    Q = coll.Qmat[start_idx:, start_idx:]

    QDs = [qdelta_implicit(coll, 'MIN-SR-FLEX', k=i + 1)[start_idx:, start_idx:] for i in range(M)]
    for QD in QDs:
        assert np.all(np.diag(np.diag(QD)) == QD), 'QDelta not diagonal'

    n = Q.shape[0]
    K = np.eye(n)
    for QD in QDs:
        K = (np.eye(n) - np.linalg.inv(QD) @ Q) @ K
    nilpotency = np.linalg.norm(K, ord=np.inf)
    assert nilpotency < 1e-10, f'FLEX product not nilpotent after {M} sweeps (norm={nilpotency})'

    assert is_k_dependent('MIN-SR-FLEX')
    assert not is_k_dependent('IE')
    # k > M falls back to the stiff-limit diagonal
    late = qdelta_implicit(coll, 'MIN-SR-FLEX', k=M + 3)
    assert np.allclose(late, qdelta_implicit(coll, 'MIN-SR-S'))


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_lu(node_type, quad_type, M):
    if M > 3 and node_type == 'EQUID' and quad_type in ['GAUSS', 'RADAU-RIGHT']:
        # same known edge case the reference skips (test_preconditioners.py:141)
        return
    coll = _coll(M, node_type, quad_type)
    Q = coll.q
    QDelta = qdelta_implicit(coll, 'LU')[1:, 1:]
    if quad_type in ['LOBATTO', 'RADAU-LEFT']:
        QDelta = QDelta[1:, 1:]
        Q = Q[1:, 1:]
    K = np.eye(Q.shape[0]) - np.linalg.solve(QDelta, Q)
    nilpotency = np.linalg.norm(np.linalg.matrix_power(K, M), ord=np.inf)
    assert nilpotency < 1e-12, f'I-QDelta^-1 Q not nilpotent (M={M}, norm={nilpotency})'


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_Qpar(node_type, quad_type, M):
    coll = _coll(M, node_type, quad_type)
    QDelta = qdelta_implicit(coll, 'Qpar')[1:, 1:]
    assert np.all(np.diag(np.diag(QDelta)) == QDelta)
    assert np.all(np.diag(QDelta) == np.diag(coll.q))


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_IE(node_type, quad_type, M):
    coll = _coll(M, node_type, quad_type)
    QDelta = qdelta_implicit(coll, 'IE')[1:, 1:]
    for i in range(M):
        assert np.all(QDelta[i, : i + 1] == QDelta[-1, : i + 1]), 'columns not constant'
    assert np.allclose(np.cumsum(QDelta[-1]), coll.nodes), 'last row cumsum != nodes'


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_IEpar(node_type, quad_type, M):
    coll = _coll(M, node_type, quad_type)
    QDelta = qdelta_implicit(coll, 'IEpar')[1:, 1:]
    assert np.all(np.diag(np.diag(QDelta)) == QDelta)
    assert np.allclose(np.diag(QDelta), coll.nodes - coll.tleft)
    assert is_diagonal(QDelta)


@pytest.mark.parametrize('node_type', NODE_TYPES)
@pytest.mark.parametrize('quad_type', QUAD_TYPES)
@pytest.mark.parametrize('M', NUM_NODES)
def test_EE_and_PIC(node_type, quad_type, M):
    coll = _coll(M, node_type, quad_type)
    QDelta = qdelta_explicit(coll, 'EE')
    # strictly lower triangular including the header column rule
    assert np.all(np.triu(QDelta, k=0) == 0)
    # first column: distance tleft -> first node, on every active row
    assert np.allclose(QDelta[1:, 0], coll.nodes[0] - coll.tleft)
    # row m: explicit Euler reproduces node positions
    assert np.allclose(QDelta[1:, :].sum(axis=1), coll.nodes - coll.tleft)

    assert np.all(qdelta_implicit(coll, 'PIC') == 0)
    assert np.all(qdelta_explicit(coll, 'PIC') == 0)


@pytest.mark.parametrize('M', NUM_NODES)
def test_TRAP(M):
    coll = _coll(M, 'LEGENDRE', 'RADAU-RIGHT')
    T = qdelta_implicit(coll, 'TRAP')[1:, 1:]
    IE = qdelta_implicit(coll, 'IE')[1:, 1:]
    EE = qdelta_explicit(coll, 'EE')[1:, 1:]
    assert np.allclose(T, 0.5 * (IE + EE))
    assert np.all(np.triu(T, k=1) == 0)


def test_unknown_generator_raises():
    coll = _coll(3, 'LEGENDRE', 'RADAU-RIGHT')
    with pytest.raises(ValueError):
        qdelta_implicit(coll, 'NOPE')
    with pytest.raises(ValueError):
        qdelta_explicit(coll, 'NOPE')
    with pytest.raises(ValueError):
        qdelta_implicit(coll, 'MIN-SR-FLEX', k=0)
