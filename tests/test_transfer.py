"""Transfer-layer tests: interpolation order, FAS tau properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.transfer.space_mesh import MeshTransfer, interpolation_matrix_1d
from pysdc_tpu.transfer.base_transfer import BaseTransfer
from pysdc_tpu.core.level import Level
from pysdc_tpu.core.errors import TransferError, UnlockError
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit


@pytest.mark.parametrize('periodic', [True, False])
@pytest.mark.parametrize('order', [2, 4, 6])
def test_interpolation_order(periodic, order):
    """Interpolating a polynomial of degree < order from coarse to fine must
    be (near-)exact; a smooth function must converge at the expected order."""
    if periodic:
        nf, nc = 64, 32
        fg, cg = np.arange(nf) / nf, np.arange(nc) / nc
        f = lambda x: np.sin(2 * np.pi * x) + 0.3 * np.cos(4 * np.pi * x)
    else:
        nf, nc = 63, 31
        fg, cg = np.arange(1, nf + 1) / (nf + 1), np.arange(1, nc + 1) / (nc + 1)
        f = lambda x: np.sin(np.pi * x)  # respects homogeneous Dirichlet BCs

    P = interpolation_matrix_1d(fg, cg, k=order, periodic=periodic)
    err1 = np.max(np.abs(P @ f(cg) - f(fg)))

    # row sums of an interpolation matrix are 1 (constants preserved);
    # near Dirichlet boundaries dropped ghost columns make the sum < 1,
    # so check interior rows only
    interior = slice(order, -order)
    assert np.allclose(P[interior].sum(axis=1), 1.0, atol=1e-12)
    assert err1 < 10 ** (-order) * 50, f'interpolation too inaccurate: {err1}'


def test_restriction_is_scaled_transpose():
    pf = HeatND(nvars=64, bc='periodic')
    pc = HeatND(nvars=32, bc='periodic')
    tr = MeshTransfer(pf, pc, dict(iorder=4, rorder=4))
    assert np.allclose(tr.R_1d[0], 0.5 * tr.P_1d[0].T)


def test_odd_order_raises():
    pf = HeatND(nvars=64, bc='periodic')
    pc = HeatND(nvars=32, bc='periodic')
    with pytest.raises(TransferError):
        MeshTransfer(pf, pc, dict(iorder=3, rorder=2))


def _make_level(nvars, num_nodes, dt):
    prob = HeatND(nvars=nvars, nu=0.1, freq=2, bc='periodic')
    sweep = GenericImplicit({'num_nodes': num_nodes, 'QI': 'LU'})
    lvl = Level(prob, sweep, {'dt': dt, 'restol': 1e-12})
    lvl.status.time = 0.0
    return lvl


def test_fas_tau_vanishes_on_matching_levels():
    """With identical space/collocation resolution, tau must vanish."""
    fine = _make_level(64, 3, 0.1)
    coarse = _make_level(64, 3, 0.1)
    tr = BaseTransfer(fine, coarse, {}, MeshTransfer, dict(iorder=4, rorder=4))
    fine.predict(fine.prob.u_exact(0.0))
    fine.update_nodes()
    tr.restrict()
    assert float(jnp.max(jnp.abs(coarse.state.tau))) < 1e-13


def test_fas_prolongation_identity_without_coarse_change():
    """Prolongation of an unchanged coarse level must leave the fine level as is."""
    fine = _make_level(64, 3, 0.1)
    coarse = _make_level(32, 3, 0.1)
    tr = BaseTransfer(fine, coarse, {}, MeshTransfer, dict(iorder=4, rorder=4))
    fine.predict(fine.prob.u_exact(0.0))
    fine.update_nodes()
    u_before = np.asarray(fine.state.u)
    tr.restrict()
    tr.prolong()  # coarse unchanged since restriction -> correction is zero
    assert np.max(np.abs(np.asarray(fine.state.u) - u_before)) < 1e-13


def test_restrict_locked_level_raises():
    fine = _make_level(64, 3, 0.1)
    coarse = _make_level(32, 3, 0.1)
    tr = BaseTransfer(fine, coarse, {}, MeshTransfer, dict(iorder=4, rorder=4))
    with pytest.raises(UnlockError):
        tr.restrict()
    with pytest.raises(UnlockError):
        tr.prolong()


def test_fft_transfer_roundtrip_identity():
    """Nyquist fold/split: restrict(prolong(g)) == g exactly, and band-limited
    fine fields survive prolong(restrict(f))."""
    import numpy as np
    from pysdc_tpu.transfer.space_fft import FFTTransfer

    class FakeP:
        def __init__(self, shape):
            self.shape = shape

    rng = np.random.RandomState(1)
    for fs, cs in (((64, 64), (32, 32)), ((16, 16, 16), (8, 8, 8)), ((2, 64), (2, 32))):
        tr = FFTTransfer(FakeP(fs), FakeP(cs), {})
        g = jnp.asarray(rng.randn(*cs))
        assert float(jnp.max(jnp.abs(tr.restrict(tr.prolong(g)) - g))) < 1e-13

    tr = FFTTransfer(FakeP((64, 64)), FakeP((32, 32)), {})
    x = np.arange(64) / 64
    fb = jnp.asarray(np.sin(2 * np.pi * 3 * np.outer(x, np.ones(64))) + np.cos(2 * np.pi * 5 * np.outer(np.ones(64), x)))
    assert float(jnp.max(jnp.abs(tr.prolong(tr.restrict(fb)) - fb))) < 1e-13
