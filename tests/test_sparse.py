"""Tests for the from-scratch sparse linear-algebra layer (the north star).

Covers: CSR algebra (SpGEMM, kron, add, transpose) against dense numpy;
ELL/BSR device SpMV; the Pallas BSR SpMM kernel; banded/cyclic/block-Thomas
factorizations; the Galerkin RAP coarse-operator product; the
SparseFDOperator cross-gated against the eigen/FFT path (identical SDC
iteration counts + solutions on separable cases, reference invariant:
``generic_ND_FD.py:208-240``); and the variable-coefficient diffusion
problems end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.heat import HeatND, HeatNDForced
from pysdc_tpu.models.var_diffusion import (
    VarCoeffDiffusion1D,
    VarCoeffDiffusion2D,
    VarCoeffDiffusionForced1D,
)
from pysdc_tpu.ops import banded
from pysdc_tpu.ops.sparse import BSR, CSR, ELL, galerkin_product
from pysdc_tpu.ops.sparse_op import SparseFDOperator, assemble_ndim_fd
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.sweepers.imex import IMEXSweeper
from pysdc_tpu.utils.stats import get_sorted

RNG = np.random.default_rng(42)


def _random_csr(n, m, density=0.1):
    k = max(1, int(n * m * density))
    return CSR.from_coo(
        RNG.integers(0, n, k), RNG.integers(0, m, k), RNG.normal(size=k), (n, m)
    )


# ----------------------------------------------------------------------
# host CSR algebra
# ----------------------------------------------------------------------
def test_csr_roundtrip_and_algebra():
    A = _random_csr(37, 23)
    D = A.to_dense()
    assert np.allclose(CSR.from_dense(D).to_dense(), D)
    assert np.allclose(A.T.to_dense(), D.T)
    assert np.allclose((A + A.scale(-0.5)).to_dense(), 0.5 * D)
    x = RNG.normal(size=23)
    assert np.allclose(A.dot_vec(x), D @ x)
    assert np.allclose(A.diagonal(), np.diag(D[:23, :23]))


def test_spgemm_matches_dense():
    A = _random_csr(40, 30)
    B = _random_csr(30, 50)
    assert np.allclose((A @ B).to_dense(), A.to_dense() @ B.to_dense())


def test_spgemm_empty_rows():
    A = CSR.from_coo([0], [0], [2.0], (5, 5))
    B = CSR.from_coo([4], [4], [3.0], (5, 5))
    assert (A @ B).nnz == 0


def test_kron_matches_dense():
    A = _random_csr(6, 5)
    B = _random_csr(4, 7)
    assert np.allclose(A.kron(B).to_dense(), np.kron(A.to_dense(), B.to_dense()))


def test_galerkin_rap():
    A = _random_csr(32, 32, 0.2)
    P = _random_csr(32, 8, 0.3)
    C = galerkin_product(P, A)
    assert np.allclose(C.to_dense(), P.to_dense().T @ A.to_dense() @ P.to_dense(), atol=1e-12)
    R = _random_csr(8, 32, 0.3)
    C2 = galerkin_product(P, A, R=R)
    assert np.allclose(C2.to_dense(), R.to_dense() @ A.to_dense() @ P.to_dense(), atol=1e-12)


def test_banded_storage():
    A = CSR.diags([np.full(9, 1.0), np.full(10, -2.0), np.full(9, 1.5)], [-1, 0, 1], (10, 10))
    bands, offsets = A.to_banded()
    assert list(offsets) == [-1, 0, 1]
    assert np.allclose(bands[1], -2.0)


# ----------------------------------------------------------------------
# device formats
# ----------------------------------------------------------------------
def test_ell_spmv_and_batch():
    A = _random_csr(64, 48)
    E = ELL.from_csr(A)
    x = RNG.normal(size=48)
    assert np.allclose(np.asarray(E.spmv(jnp.asarray(x))), A.to_dense() @ x)
    xb = RNG.normal(size=(5, 48))
    assert np.allclose(np.asarray(E.spmv(jnp.asarray(xb))), xb @ A.to_dense().T)


def test_ell_is_pytree():
    E = ELL.from_csr(_random_csr(8, 8))
    leaves, treedef = jax.tree_util.tree_flatten(E)
    assert len(leaves) == 2
    E2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert E2.shape == E.shape


def test_bsr_spmv():
    A = _random_csr(64, 64, 0.15)
    Bs = BSR.from_csr(A, 8, 8)
    x = RNG.normal(size=64)
    assert np.allclose(np.asarray(Bs.spmv(jnp.asarray(x))), A.to_dense() @ x)


def test_pallas_bsr_spmm():
    from pysdc_tpu.ops.pallas.spmv import bsr_spmm

    A = _random_csr(128, 128, 0.1)
    Bs = BSR.from_csr(A, 8, 8)
    u = RNG.normal(size=(128, 5))
    y = np.asarray(bsr_spmm(Bs, jnp.asarray(u), interpret=True))
    assert np.allclose(y, A.to_dense() @ u, atol=1e-12)


def test_pallas_bsr_spmm_large_blocks():
    from pysdc_tpu.ops.pallas.spmv import bsr_spmm

    A = _random_csr(256, 256, 0.1)
    Bs = BSR.from_csr(A, 128, 128)
    u = RNG.normal(size=(256, 4))
    y = np.asarray(bsr_spmm(Bs, jnp.asarray(u), interpret=True))
    assert np.allclose(y, A.to_dense() @ u, atol=1e-12)


def test_apply_bsr_auto_blocking():
    """apply_bsr auto-picks the largest MXU-aligned block size dividing the
    grid and matches the DIA apply."""
    from pysdc_tpu.models.var_diffusion import VarCoeffDiffusion2D

    coeff = lambda X, Y: 0.1 * (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    prob = VarCoeffDiffusion2D(nvars=(16, 16), coeff_fn=coeff, dtype=jnp.float64)
    u = RNG.normal(size=(256, 3))
    y = np.asarray(prob.A.apply_bsr(jnp.asarray(u), interpret=True))
    assert prob.A._bsr.br == 256  # 16x16 grid -> n=256 -> full-size blocks
    ref = np.stack([np.asarray(prob.A.apply(jnp.asarray(u[:, b]).reshape(16, 16))).ravel() for b in range(3)], axis=1)
    assert np.allclose(y, ref, atol=1e-10)


# ----------------------------------------------------------------------
# structured factorizations
# ----------------------------------------------------------------------
def test_tridiag_thomas():
    n = 50
    lo, dg, up = -RNG.random(n), 2.5 + RNG.random(n), -RNG.random(n)
    D = np.diag(dg) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
    b = RNG.normal(size=(3, n))
    x = np.asarray(banded.tridiag_solve(jnp.asarray(lo), jnp.asarray(dg), jnp.asarray(up), jnp.asarray(b)))
    assert np.allclose(x @ D.T, b, atol=1e-10)


def test_cyclic_tridiag():
    n = 32
    lo, dg, up = -RNG.random(n), 3.0 + RNG.random(n), -RNG.random(n)
    c_lo, c_up = -0.7, -0.3
    D = np.diag(dg) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
    D[0, n - 1] = c_up
    D[n - 1, 0] = c_lo
    b = RNG.normal(size=n)
    x = np.asarray(banded.cyclic_tridiag_solve(
        jnp.asarray(lo), jnp.asarray(dg), jnp.asarray(up), c_lo, c_up, jnp.asarray(b)))
    assert np.allclose(D @ x, b, atol=1e-10)


def test_banded_lu():
    n = 40
    A = CSR.diags(
        [np.full(n, 0.2), -1 - RNG.random(n), 4 + RNG.random(n), -1 - RNG.random(n), np.full(n, 0.3)],
        [-2, -1, 0, 1, 2], (n, n),
    )
    bands, _ = A.to_banded()
    b = RNG.normal(size=n)
    x = np.asarray(banded.banded_shifted_solve(bands, 2, 2, jnp.asarray(b), 0.25))
    assert np.allclose((np.eye(n) - 0.25 * A.to_dense()) @ x, b, atol=1e-9)


def test_block_tridiag():
    m = 8
    T = CSR.diags([np.ones(m), -4 * np.ones(m), np.ones(m)], [-1, 0, 1], (m, m))
    I = CSR.eye(m)
    S = CSR.diags([np.ones(m), np.zeros(m), np.ones(m)], [-1, 0, 1], (m, m))
    A2 = T.kron(I) + I.kron(S)
    sub, dg, sup = banded.block_tridiag_from_csr(A2, m)
    b = RNG.normal(size=(2, m * m))
    x = np.asarray(banded.block_tridiag_shifted_solve(sub, dg, sup, jnp.asarray(b), 0.05))
    M = np.eye(m * m) - 0.05 * A2.to_dense()
    assert np.allclose(x @ M.T, b, atol=1e-9)


def test_factorization_with_traced_shift():
    """The shift stays traced: one compile serves every dt (adaptivity)."""
    n = 24
    A = CSR.diags([np.ones(n), -2 * np.ones(n), np.ones(n)], [-1, 0, 1], (n, n))
    lo = np.zeros(n); dg = np.full(n, -2.0); up = np.zeros(n)
    lo[1:], up[:-1] = 1.0, 1.0

    traces = []

    @jax.jit
    def solve(b, f):
        traces.append(1)
        return banded.tridiag_solve(-f * jnp.asarray(lo), 1 - f * jnp.asarray(dg), -f * jnp.asarray(up), b)

    b = jnp.asarray(RNG.normal(size=n))
    for f in (0.1, 0.01, 0.3333):
        x = np.asarray(solve(b, f))
        assert np.allclose((np.eye(n) - f * A.to_dense()) @ x, np.asarray(b), atol=1e-9)
    assert len(traces) == 1, 'dt changes must not retrace'


# ----------------------------------------------------------------------
# SparseFDOperator vs the eigen path (cross-gate on separable cases)
# ----------------------------------------------------------------------
@pytest.mark.parametrize('bc', ['dirichlet-zero', 'periodic'])
def test_sparse_operator_matches_eigen_1d(bc):
    from pysdc_tpu.ops.linop import SeparableFDOperator

    n = 64
    dx = 1.0 / (n if bc == 'periodic' else n + 1)
    per_dim = [dict(size=n, dx=dx, derivative=2, order=2, bc=bc)]
    S = SparseFDOperator(per_dim, scale=0.1)
    E = SeparableFDOperator(per_dim, scale=0.1)
    u = jnp.asarray(RNG.normal(size=n))
    assert np.allclose(np.asarray(S.apply(u)), np.asarray(E.apply(u)), atol=1e-11)
    x_s = np.asarray(S.solve_shifted(u, 0.05))
    x_e = np.asarray(E.solve_shifted(u, 0.05))
    assert np.allclose(x_s, x_e, atol=1e-10)
    # Dirichlet boundary rows use wider one-sided stencils -> banded LU
    assert S.solver_kind == ('cyclic_tridiag' if bc == 'periodic' else 'banded')


def test_sparse_operator_2d_block_tridiag():
    from pysdc_tpu.ops.linop import SeparableFDOperator

    n = 12
    dx = 1.0 / (n + 1)
    per_dim = [dict(size=n, dx=dx, derivative=2, order=2, bc='dirichlet-zero')] * 2
    S = SparseFDOperator(per_dim)
    E = SeparableFDOperator(per_dim)
    assert S.solver_kind == 'block_tridiag'
    u = jnp.asarray(RNG.normal(size=(n, n)))
    assert np.allclose(np.asarray(S.apply(u)), np.asarray(E.apply(u)), atol=1e-10)
    assert np.allclose(
        np.asarray(S.solve_shifted(u, 0.02)), np.asarray(E.solve_shifted(u, 0.02)), atol=1e-9
    )


def _run_sdc(problem_class, problem_params, sweeper=GenericImplicit, dt=0.05, Tend=0.2,
             sweeper_params=None):
    desc = dict(
        problem_class=problem_class,
        problem_params=problem_params,
        sweeper_class=sweeper,
        sweeper_params=sweeper_params or dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-10, dt=dt),
        step_params=dict(maxiter=30),
    )
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u0 = P.u_exact(0.0) if hasattr(P, 'u_exact') else P.u_init
    try:
        u0 = P.u_exact(0.0)
    except NotImplementedError:
        u0 = P.u_init
    uend, stats = c.run(u0, 0.0, Tend)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    return np.asarray(uend), iters, P


def test_heat_sparse_backend_iteration_parity():
    """BASELINE config 1 through the sparse path: identical iteration counts
    and solutions vs the eigen backend."""
    u_e, it_e, _ = _run_sdc(HeatND, dict(nvars=63, nu=0.1, freq=2, bc='dirichlet-zero'))
    u_s, it_s, P = _run_sdc(HeatND, dict(nvars=63, nu=0.1, freq=2, bc='dirichlet-zero', backend='sparse'))
    assert it_e == it_s
    assert np.allclose(u_e, u_s, atol=1e-9)
    assert P.A.solver_kind == 'banded'  # Dirichlet boundary rows widen the band


def test_heat_forced_sparse_backend_imex():
    u_e, it_e, _ = _run_sdc(
        HeatNDForced, dict(nvars=64, nu=0.1, freq=2, bc='periodic'), sweeper=IMEXSweeper)
    u_s, it_s, P = _run_sdc(
        HeatNDForced, dict(nvars=64, nu=0.1, freq=2, bc='periodic', backend='sparse'),
        sweeper=IMEXSweeper)
    assert it_e == it_s
    assert np.allclose(u_e, u_s, atol=1e-8)
    assert P.A.solver_kind == 'cyclic_tridiag'


# ----------------------------------------------------------------------
# variable-coefficient diffusion end to end
# ----------------------------------------------------------------------
def test_var_diffusion_constant_limit_matches_heat():
    """With a ≡ nu the variable-coefficient operator reduces to the heat
    operator — gate apply + solve against HeatND's eigen path."""
    n, nu = 63, 0.3
    V = VarCoeffDiffusion1D(nvars=n, nu=nu, bc='dirichlet')
    H = HeatND(nvars=n, nu=nu, bc='dirichlet-zero')
    u = jnp.asarray(RNG.normal(size=n))
    assert np.allclose(np.asarray(V.eval_f(u, 0.0)), np.asarray(H.eval_f(u, 0.0)), atol=1e-10)
    assert np.allclose(
        np.asarray(V.solve_system(u, 0.01, u, 0.0)),
        np.asarray(H.solve_system(u, 0.01, u, 0.0)), atol=1e-10,
    )


def test_var_diffusion_sdc_order():
    """SDC converges on the genuinely variable-coefficient problem; the
    discrete forcing makes the semi-discrete solution exact, so the error is
    pure time error and must drop with dt at the collocation order."""
    coeff = lambda x: 1.0 + 0.8 * np.sin(2 * np.pi * x)
    errs = []
    for dt in (0.1, 0.05):
        desc = dict(
            problem_class=VarCoeffDiffusionForced1D,
            problem_params=dict(nvars=63, coeff_fn=coeff, freq=2),
            sweeper_class=IMEXSweeper,
            sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3, QI='LU'),
            level_params=dict(restol=1e-11, dt=dt),
            step_params=dict(maxiter=40),
        )
        c = ControllerNonMPI(1, {'logger_level': 40}, desc)
        P = c.MS[0].levels[0].prob
        uend, _ = c.run(P.u_exact(0.0), 0.0, 0.4)
        errs.append(float(jnp.max(jnp.abs(uend - P.u_exact(0.4)))))
    assert errs[1] < errs[0] / 4  # at least order 2 observed; typically ~5
    assert errs[1] < 1e-6


def test_var_diffusion_2d_spd_and_solve():
    coeff = lambda x, y: 1.0 + 0.5 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    P = VarCoeffDiffusion2D(nvars=(12, 12), coeff_fn=coeff)
    # default routing: spectral-preconditioned CG (scale-out lane); the
    # block cyclic-reduction direct lane stays reachable by override
    assert P.A.solver_kind == 'pcg'
    assert VarCoeffDiffusion2D(
        nvars=(12, 12), coeff_fn=coeff, solver='block_tridiag'
    ).A.solver_kind == 'block_tridiag'
    D = P.A.A.to_dense()
    assert np.allclose(D, D.T, atol=1e-12), 'conservative assembly must be symmetric'
    assert np.all(np.linalg.eigvalsh(D) < 1e-10), 'diffusion operator must be negative semidefinite'
    rhs = jnp.asarray(RNG.normal(size=(12, 12)))
    x = P.solve_system(rhs, 0.01, rhs, 0.0)
    res = np.asarray(rhs) - (np.asarray(x) - 0.01 * np.asarray(P.eval_f(x, 0.0)))
    assert np.abs(res).max() < 1e-9


def test_galerkin_coarse_operator_consistency():
    """RAP-built coarse operator of the 1D Laplacian: coarse stencil rows
    must sum to ~0 (consistency) and the operator must stay symmetric."""
    n_f = 31
    dx = 1.0 / (n_f + 1)
    A, _ = assemble_ndim_fd([dict(size=n_f, dx=dx, derivative=2, order=2, bc='dirichlet-zero')])
    # linear interpolation from the n_c=15 coarse grid (every other point)
    n_c = 15
    rows, cols, vals = [], [], []
    for j in range(n_c):
        i = 2 * j + 1
        rows += [i, i - 1, i + 1]
        cols += [j, j, j]
        vals += [1.0, 0.5, 0.5]
    P = CSR.from_coo(rows, cols, vals, (n_f, n_c))
    Ac = galerkin_product(P, A, R=P.T.scale(0.5))
    D = Ac.to_dense()
    assert np.allclose(D, D.T, atol=1e-12)
    # interior rows of RAP of the 3-point Laplacian reproduce the coarse-grid
    # 3-point Laplacian (classical result for linear interpolation)
    expected = np.array([1.0, -2.0, 1.0]) / (2 * dx) ** 2
    assert np.allclose(D[7, 6:9], expected, rtol=1e-12)


# -- parallel structured solvers (round-3: cyclic reduction) ---------------
def test_pcr_matches_thomas():
    """Parallel cyclic reduction == Thomas scan on general tridiagonals."""
    from pysdc_tpu.ops.banded import tridiag_pcr_solve, tridiag_solve

    for n in (3, 8, 17, 64, 100, 255):
        lo = RNG.normal(size=n) * 0.3
        up = RNG.normal(size=n) * 0.3
        dg = 2.0 + RNG.random(n)
        rhs = RNG.normal(size=(2, n))
        x_thomas = np.asarray(tridiag_solve(jnp.asarray(lo), jnp.asarray(dg), jnp.asarray(up), jnp.asarray(rhs)))
        x_pcr = np.asarray(tridiag_pcr_solve(jnp.asarray(lo), jnp.asarray(dg), jnp.asarray(up), jnp.asarray(rhs)))
        assert np.abs(x_thomas - x_pcr).max() < 1e-12, f'n={n}'


def test_block_cr_matches_dense():
    """Block cyclic reduction (factor/solve split) == dense solve, any nb."""
    from pysdc_tpu.ops.banded import block_cr_factor, block_cr_solve

    for nb, b in ((2, 3), (5, 2), (16, 4), (33, 4)):
        sub = RNG.normal(size=(nb, b, b)) * 0.1
        sup = RNG.normal(size=(nb, b, b)) * 0.1
        dg = RNG.normal(size=(nb, b, b)) * 0.2 + 3 * np.eye(b)[None]
        rhs = RNG.normal(size=(2, nb, b))
        fac = block_cr_factor(jnp.asarray(sub), jnp.asarray(dg), jnp.asarray(sup))
        x = np.asarray(block_cr_solve(fac, jnp.asarray(rhs)))
        A = np.zeros((nb * b, nb * b))
        for r in range(nb):
            A[r * b:(r + 1) * b, r * b:(r + 1) * b] = dg[r]
            if r > 0:
                A[r * b:(r + 1) * b, (r - 1) * b:r * b] = sub[r]
            if r < nb - 1:
                A[r * b:(r + 1) * b, (r + 1) * b:(r + 2) * b] = sup[r]
        x_dense = np.linalg.solve(A, rhs.reshape(2, -1).T).T.reshape(2, nb, b)
        assert np.abs(x - x_dense).max() < 1e-10, f'nb={nb} b={b}'


def test_prepared_node_factors_match_traced_path():
    """The prepared block-CR path (node-indexed factors + refinement) must
    reproduce the traced factorization path exactly in a real sweep."""
    from pysdc_tpu.core.level import Level
    from pysdc_tpu.models.var_diffusion import VarCoeffDiffusion2D
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    n = 24
    coeff = lambda X, Y: 0.1 * (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    prob = VarCoeffDiffusion2D(nvars=(n, n), coeff_fn=coeff, solver='block_tridiag')
    sweep = GenericImplicit({'num_nodes': 3, 'quad_type': 'RADAU-RIGHT', 'QI': 'LU'})
    Level(prob, sweep, {'dt': 1e-3, 'restol': 1e-12})  # triggers preparation
    assert prob.accepts_node_index
    assert prob.A.solver_kind == 'block_tridiag'

    dt = jnp.asarray(1e-3)
    t = jnp.asarray(0.0)
    X, Y = prob.grids
    u0 = jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)
    state = sweep.predict(prob, u0, t, dt, 0.0)
    s_prep = sweep.update_nodes(prob, state, t, dt, 0)
    prob.accepts_node_index = False  # force the traced-factorization path
    s_traced = sweep.update_nodes(prob, state, t, dt, 0)
    assert float(jnp.max(jnp.abs(s_prep.u - s_traced.u))) < 1e-13


def test_prepared_factors_refine_on_shift_drift():
    """Prepared at one dt, solved at another: the refinement loop must turn
    the stale factorization into a preconditioner and still hit tolerance
    (the adaptive-dt safety property)."""
    from pysdc_tpu.models.var_diffusion import VarCoeffDiffusion2D

    n = 16
    prob = VarCoeffDiffusion2D(nvars=(n, n), coeff_fn=lambda X, Y: 0.2 + 0.1 * X * Y)
    prob.A.prepare_node_shifts([1e-3])
    rhs = jnp.asarray(RNG.normal(size=(n, n)))
    factor = jnp.asarray(2.5e-3)  # 2.5x off the prepared shift
    x = prob.A.solve_shifted(rhs, factor, node=0)
    res = np.asarray(rhs) - (np.asarray(x) - float(factor) * np.asarray(prob.A.apply(x)))
    assert np.abs(res).max() < 1e-10


# ----------------------------------------------------------------------
# Galerkin (RAP/SpGEMM) coarse operators in the transfer layer
# ----------------------------------------------------------------------
def _mlsdc_heat_sparse(coarse_op, nvars=(64, 64), P=1):
    import jax.numpy as jnp

    from pysdc_tpu.models.heat import HeatND
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
    from pysdc_tpu.utils.stats import get_sorted

    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[nvars, tuple(n // 2 for n in nvars)],
                            bc='periodic', backend='sparse'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=30),
        base_transfer_params=dict(coarse_op=coarse_op),
        space_transfer_params=dict(rorder=2, iorder=2, periodic=True),
    )
    ctrl = ControllerNonMPI(P, {'logger_level': 40}, desc)
    prob = ctrl.MS[0].levels[0].prob
    u, s = ctrl.run(prob.u_exact(0.0), 0.0, P * 0.05)
    return ctrl, u, [v for _, v in get_sorted(s, type='niter')]


def test_galerkin_coarse_operator_assembly():
    """The installed coarse operator equals the explicit dense R A P."""
    ctrl, _, _ = _mlsdc_heat_sparse('galerkin', nvars=(16, 16))
    bt = ctrl.MS[0].base_transfers[0]
    st = bt.space_transfer
    A_f = np.asarray(ctrl.MS[0].levels[0].prob.A.A.to_dense())
    A_c = np.asarray(ctrl.MS[0].levels[1].prob.A.A.to_dense())
    P_nd = np.kron(st.P_1d[0], st.P_1d[1])
    R_nd = np.kron(st.R_1d[0], st.R_1d[1])
    np.testing.assert_allclose(A_c, R_nd @ A_f @ P_nd, rtol=1e-12, atol=1e-12)


def test_galerkin_vs_rediscretized_mlsdc_cross_gate():
    """VERDICT cross-gate: MLSDC on sparse-backend heat with Galerkin coarse
    operators converges with the same iteration counts (+-0) and to the same
    solution tolerance as re-discretized coarse operators."""
    _, u_redisc, it_redisc = _mlsdc_heat_sparse('rediscretize')
    _, u_gal, it_gal = _mlsdc_heat_sparse('galerkin')
    assert it_redisc == it_gal, f'{it_redisc} vs {it_gal}'
    assert float(np.max(np.abs(np.asarray(u_redisc) - np.asarray(u_gal)))) < 1e-8


def test_galerkin_requires_sparse_backend():
    from pysdc_tpu.core.errors import TransferError
    from pysdc_tpu.models.heat import HeatND
    from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
    from pysdc_tpu.sweepers.generic_implicit import GenericImplicit

    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[(16, 16), (8, 8)], bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=1e-9, dt=0.05),
        step_params=dict(maxiter=30),
        base_transfer_params=dict(coarse_op='galerkin'),
        space_transfer_params=dict(rorder=2, iorder=2, periodic=True),
    )
    with pytest.raises(TransferError, match='sparse'):
        ControllerNonMPI(1, {'logger_level': 40}, desc)


# ----------------------------------------------------------------------
# DIA roll-based SpMV and the spectrally-preconditioned CG lane
# ----------------------------------------------------------------------
def test_dia_spmv_matches_ell_including_periodic_wrap():
    from pysdc_tpu.ops.sparse import DIA, ELL

    n = 40
    # periodic tridiagonal + wrap corners + an extra far diagonal
    e = np.ones(n)
    A = CSR.diags([e, -2.0 * e, e], [-1, 0, 1], (n, n))
    A = A + CSR.from_coo([0, n - 1, 3], [n - 1, 0, 33], [0.5, 0.25, -1.5], (n, n))
    dia = DIA.from_csr(A)
    assert dia is not None
    u = jnp.asarray(RNG.normal(size=(3, n)))
    got = np.asarray(dia.spmv(u))
    want = np.asarray(ELL.from_csr(A).spmv(u))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # dense sanity
    np.testing.assert_allclose(got[0], A.to_dense() @ np.asarray(u[0]), rtol=1e-12, atol=1e-12)


def test_dia_rejects_unstructured():
    from pysdc_tpu.ops.sparse import DIA

    rng = np.random.default_rng(3)
    n = 64
    rows = rng.integers(0, n, 200)
    cols = rng.integers(0, n, 200)
    A = CSR.from_coo(rows, cols, rng.normal(size=200), (n, n))
    assert DIA.from_csr(A, max_diags=24) is None


def test_pcg_matches_block_tridiag_direct():
    """The spectral-PCG lane and the block cyclic-reduction direct lane
    solve the same shifted system to the same answer."""
    coeff = lambda X, Y: 0.1 * (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    p_pcg = VarCoeffDiffusion2D(nvars=(24, 24), coeff_fn=coeff)
    p_dir = VarCoeffDiffusion2D(nvars=(24, 24), coeff_fn=coeff, solver='block_tridiag')
    assert p_pcg.A.solver_kind == 'pcg'
    rhs = jnp.asarray(RNG.normal(size=(24, 24)))
    x_pcg = p_pcg.A.solve_shifted(rhs, 2e-3)
    x_dir = p_dir.A.solve_shifted(rhs, 2e-3)
    np.testing.assert_allclose(np.asarray(x_pcg), np.asarray(x_dir), rtol=1e-8, atol=1e-10)


def test_pcg_iteration_count_tracks_coefficient_variation():
    """solve_shifted_info surfaces Krylov work; smooth +-50% variation
    needs only a handful of iterations, rougher coefficients more — but
    both stay far below unpreconditioned CG depth."""
    smooth = lambda X, Y: 0.1 * (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    rough = lambda X, Y: 0.1 * (1.0 + 0.9 * np.sign(np.sin(6 * np.pi * X)) * np.cos(2 * np.pi * Y))
    rhs = jnp.asarray(RNG.normal(size=(32, 32)))
    p1 = VarCoeffDiffusion2D(nvars=(32, 32), coeff_fn=smooth)
    p2 = VarCoeffDiffusion2D(nvars=(32, 32), coeff_fn=rough)
    x1, k1 = p1.A.solve_shifted_info(rhs, 1e-3)
    x2, k2 = p2.A.solve_shifted_info(rhs, 1e-3)
    # f64 runs iterate to ~1e-14 relative residual (the dtype floor)
    assert 0 < int(k1) <= 20
    assert int(k1) <= int(k2) <= 80
    for p, x in ((p1, x1), (p2, x2)):
        res = np.asarray(rhs) - (np.asarray(x) - 1e-3 * np.asarray(p.A.apply(x)))
        assert np.abs(res).max() <= 1e-7 * max(1.0, np.abs(np.asarray(rhs)).max())


def test_sparse_heat_2d_rides_pcg_with_exact_preconditioner():
    """Sparse-backend heat's surrogate IS the operator: PCG converges in
    one iteration and matches the eigen backend."""
    from pysdc_tpu.models.heat import HeatND

    p_sp = HeatND(nvars=(32, 32), nu=0.1, freq=2, bc='periodic', backend='sparse')
    p_ei = HeatND(nvars=(32, 32), nu=0.1, freq=2, bc='periodic', backend='eigen')
    assert p_sp.A.solver_kind == 'pcg'
    rhs = jnp.asarray(RNG.normal(size=(32, 32)))
    x_sp, k = p_sp.A.solve_shifted_info(rhs, 5e-4)
    x_ei = p_ei.A.solve_shifted(rhs, 5e-4)
    assert int(k) <= 2
    np.testing.assert_allclose(np.asarray(x_sp), np.asarray(x_ei), rtol=1e-9, atol=1e-11)


# ----------------------------------------------------------------------
# Pallas DIA SpMV kernel (ops/pallas/dia.py)
# ----------------------------------------------------------------------
def _var_coeff_2d_matrix(n, periodic=True, seed=3):
    """Variable-coefficient 2D 5-point matrix incl. wrap diagonals."""
    rows = []
    lap1 = CSR.diags([np.ones(n), -2.0 * np.ones(n), np.ones(n)], [-1, 0, 1], (n, n))
    if periodic:
        lap1 = CSR.from_dense(
            lap1.to_dense() + np.eye(n, k=n - 1) + np.eye(n, k=-(n - 1))
        )
    eye = CSR.eye(n)
    A2 = lap1.kron(eye) + eye.kron(lap1)
    scale = 1.0 + 0.5 * np.random.default_rng(seed).standard_normal(n * n)
    D = CSR.diags([scale], [0], (n * n, n * n))
    return D.matmul(A2)


@pytest.mark.parametrize('version', [1, 2])
@pytest.mark.parametrize('n', [16, 24])
def test_dia_pallas_kernel_matches_rolls(version, n):
    """Both Pallas DIA kernels (per-diagonal grid v1, shared-window v2) must
    reproduce the roll-path SpMV on periodic variable-coefficient matrices
    whose offsets include +-1, +-n and the +-(n-1)/+-(n^2-n) wrap diagonals."""
    from pysdc_tpu.ops.pallas.dia import dia_spmv
    from pysdc_tpu.ops.sparse import DIA

    A = _var_coeff_2d_matrix(n)
    dia = DIA.from_csr(A)
    assert dia is not None
    u = jnp.asarray(RNG.standard_normal(n * n), jnp.float32)
    want = np.asarray(A.to_dense(), np.float64) @ np.asarray(u, np.float64)
    got_roll = np.asarray(jax.jit(dia.spmv)(u))
    got_pal = np.asarray(dia_spmv(dia, u, Tr=8, interpret=True, version=version))
    atol = 1e-4 * float(np.max(np.abs(want)) + 1)
    np.testing.assert_allclose(got_roll, want, rtol=1e-4, atol=atol)
    np.testing.assert_allclose(got_pal, want, rtol=1e-4, atol=atol)


def test_dia_pallas_kernel_batched():
    """Leading batch axes (the M collocation nodes) vmap through the kernel."""
    from pysdc_tpu.ops.pallas.dia import dia_spmv
    from pysdc_tpu.ops.sparse import DIA

    n = 16
    A = _var_coeff_2d_matrix(n, periodic=False)
    dia = DIA.from_csr(A)
    U = jnp.asarray(RNG.standard_normal((3, n * n)), jnp.float32)
    want = np.asarray(jax.vmap(dia.spmv)(U))
    got = np.asarray(dia_spmv(dia, U, Tr=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4 * np.max(np.abs(want)))


def test_sparse_operator_pallas_dia_toggle():
    """SparseFDOperator.apply can opt into the Pallas DIA kernel and must
    match the roll path bit-for-bit at f32 tolerance."""
    coeff = lambda X, Y: 0.1 * (1.0 + 0.5 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y))
    prob = VarCoeffDiffusion2D(nvars=(16, 16), coeff_fn=coeff, dtype=jnp.float32)
    u = jnp.asarray(RNG.standard_normal((3, 16, 16)), jnp.float32)
    want = np.asarray(jax.jit(prob.A.apply)(u))
    prob.A.enable_pallas_dia(Tr=8, interpret=True)
    got = np.asarray(jax.jit(prob.A.apply)(u))
    prob.A.disable_pallas_dia()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5 * np.max(np.abs(want)))
