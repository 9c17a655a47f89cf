"""Assembled sparse ND operators with structured direct solves.

The sparse execution path of the north star (BASELINE.json): where
:class:`~pysdc_tpu.ops.linop.SeparableFDOperator` diagonalizes separable
tensor-product operators, this layer handles the *general* case — variable
coefficients, cross terms, any CSR matrix — the way the reference does with
scipy CSR + cached ``splu`` (``generic_ND_FD.py:17-240``), but TPU-native:

  - the matrix is assembled on the host with the from-scratch CSR algebra
    (:mod:`pysdc_tpu.ops.sparse`), e.g. by Kronecker sums of 1D stencils;
  - ``apply`` runs as an ELL gather-SpMV (any pattern) or the Pallas BSR
    block kernel (:mod:`pysdc_tpu.ops.pallas.spmv`);
  - ``solve_shifted`` picks a structured factorization by bandwidth:
    parallel cyclic reduction (PCR, O(log n) depth) for tridiagonal, banded
    LU for small bands, block cyclic reduction for block-tridiagonal (2D
    five-point lines — every level batched on the MXU), CG as the
    unstructured fallback.  The shift stays a traced scalar — no dt-keyed
    host cache, no retracing under adaptivity.
  - ``prepare_node_shifts`` amortizes the block factorization across a whole
    run: the M per-node shifts ``dt*q_mm`` are concrete at level setup, so
    the CR factor pyramid is built once and every node solve is a pure
    substitution (the role of the reference's dt-keyed ``splu`` cache,
    generic_ND_FD.py:208-240).  A built-in residual-refinement loop keeps
    the prepared path *correct* even if the runtime shift drifts from the
    prepared one (adaptive dt): the prepared factorization then acts as a
    preconditioner instead of an exact solve.

Cross-gated against the eigen/FFT path on separable cases in
``tests/test_sparse.py``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ProblemError
from pysdc_tpu.ops import banded
from pysdc_tpu.ops.fd import fd_matrix_1d
from pysdc_tpu.ops.sparse import BSR, CSR, DIA, ELL


class SparseOperator:
    """A general sparse linear operator ``A`` with shifted direct solves.

    Parameters
    ----------
    A:         host CSR matrix (n x n), including any global scale.
    grid_shape: logical ND shape the flat operator acts on.
    bc_rhs:    optional inhomogeneous-boundary vector added by problems.
    block:     block size for the block-tridiagonal solve (defaults to the
               last grid dimension for 2D grids).
    solver:    'auto' | 'tridiag' | 'banded' | 'block_tridiag' | 'cg'
    """

    def __init__(self, A: CSR, grid_shape=None, bc_rhs=None, block=None, solver='auto',
                 precond=None):
        n = A.shape[0]
        if A.shape[0] != A.shape[1]:
            raise ProblemError('SparseOperator needs a square matrix')
        #: optional spectral preconditioner: an operator with an exact
        #: ``solve_shifted(rhs, factor)`` on the same grid (typically the
        #: nearest separable surrogate on the eigen/FFT lane).  Enables the
        #: 'pcg' solver: preconditioned conjugate gradients whose iteration
        #: count is bounded by the coefficient variation, each iteration one
        #: DIA SpMV + one spectral solve — both HBM-roofline.  This is the
        #: scale-out 2D lane; dense-block cyclic reduction's factor pyramid
        #: grows as O(nb*b^2*log nb) and stops fitting past ~128^2.
        self.precond = precond
        self.A = A
        self.grid_shape = tuple(grid_shape) if grid_shape is not None else (n,)
        self.n = n
        self.bc_rhs = None if bc_rhs is None else jnp.asarray(bc_rhs)
        self.ell = ELL.from_csr(A)
        # FD matrices live on a handful of diagonals: the DIA roll-based
        # SpMV replaces ELL's gather (~50x faster on TPU) whenever possible;
        # on 2D grids the diagonals further decompose into (row, col) shifts
        # of the grid view — sublane/lane shifts instead of whole-vector
        # lane rotations (~7x on the 1024² SpMV, see DIA.with_grid)
        self.dia = DIA.from_csr(A)
        if self.dia is not None and grid_shape is not None and len(self.grid_shape) == 2:
            self.dia = self.dia.with_grid(self.grid_shape)
        self.nnz_per_dof = A.nnz / n

        lower, upper = A.bandwidths()
        self._solver = solver
        if solver == 'auto':
            rows = A.row_of(); offs = A.indices.astype(np.int64) - rows
            in_band1 = np.abs(offs) <= 1
            corners = (~in_band1) & (
                ((rows == 0) & (offs == n - 1)) | ((rows == n - 1) & (offs == -(n - 1)))
            )
            if lower <= 1 and upper <= 1:
                self._solver = 'tridiag'
            elif np.all(in_band1 | corners) and corners.any():
                self._solver = 'cyclic_tridiag'
            elif lower <= 4 and upper <= 4:
                self._solver = 'banded'
            elif precond is not None:
                self._solver = 'pcg'
            else:
                base = block or (self.grid_shape[-1] if len(self.grid_shape) == 2 else None)
                self._solver = 'cg'
                if base:
                    # wider-bandwidth rows (e.g. one-sided boundary stencils)
                    # may need blocks spanning several grid lines
                    for mult in (1, 2, 4):
                        cand = base * mult
                        if n % cand == 0 and cand < n:
                            try:
                                banded.block_tridiag_from_csr(A, cand)
                                self._solver = 'block_tridiag'
                                block = cand
                                break
                            except ProblemError:
                                continue

        if self._solver in ('tridiag', 'cyclic_tridiag'):
            lo = np.zeros(n); dg = np.zeros(n); up = np.zeros(n)
            rows = A.row_of(); offs = A.indices.astype(np.int64) - rows
            for o, tgt in ((-1, lo), (0, dg), (1, up)):
                m = offs == o
                tgt[rows[m]] = A.data[m]
            self._tri = (lo, dg, up)
            if self._solver == 'cyclic_tridiag':
                dense_corners = [0.0, 0.0]
                m_up = (rows == 0) & (offs == n - 1)
                m_lo = (rows == n - 1) & (offs == -(n - 1))
                dense_corners[0] = float(A.data[m_lo][0]) if m_lo.any() else 0.0
                dense_corners[1] = float(A.data[m_up][0]) if m_up.any() else 0.0
                self._corners = tuple(dense_corners)  # (A[n-1,0], A[0,n-1])
        elif self._solver == 'banded':
            self._bands, _ = A.to_banded()
            self._bw = A.bandwidths()
        elif self._solver == 'block_tridiag':
            block = block or self.grid_shape[-1]
            self._blocks = banded.block_tridiag_from_csr(A, block)
            self._block = block

        #: prepared per-node factorizations: (shifts, factor-pytree with a
        #: leading node axis), built by prepare_node_shifts
        self._prep = None

    # -- prepared factorizations ----------------------------------------
    def prepare_node_shifts(self, shifts) -> bool:
        """Factor ``I - shift*A`` for each concrete shift in ``shifts``.

        Called at level setup with the M node shifts ``dt * diag(QDelta)``
        (all concrete floats).  Returns True if a prepared path exists for
        this operator's structure.  The factorization is vmapped over the
        node axis — all M reductions batch together on the MXU.
        """
        shifts = np.atleast_1d(np.asarray(shifts, dtype=float))
        if self._solver == 'block_tridiag':
            import jax

            sub, dg, sup = (jnp.asarray(v) for v in self._blocks)
            b = dg.shape[-1]
            eye = jnp.eye(b, dtype=dg.dtype)[None]

            def factor_one(s):
                return banded.block_cr_factor(-s * sub, eye - s * dg, -s * sup)

            self._prep = (shifts, jax.vmap(factor_one)(jnp.asarray(shifts)))
            return True
        return False

    def _prepared_solve(self, flat, factor, node):
        """Solve with the node's prepared factors + residual refinement.

        When the traced runtime ``factor`` equals the prepared shift (the
        fixed-dt common case) the refinement loop exits after one residual
        check; when adaptivity moved dt, the stale factorization acts as a
        preconditioner and the loop iterates to tolerance — correctness
        never depends on the hint being exact."""
        import jax

        _, factors = self._prep
        fac_m = jax.tree_util.tree_map(lambda a: a[node], factors)
        nb = self.n // self._block
        shaped = flat.reshape(flat.shape[:-1] + (nb, self._block))

        def direct(r):
            return banded.block_cr_solve(fac_m, r)

        def residual(x):
            xf = x.reshape(flat.shape)
            return shaped - (xf - factor * self._mv(xf)).reshape(shaped.shape)

        x = direct(shaped)
        r = residual(x)
        rhs_norm = jnp.linalg.norm(flat) + jnp.asarray(1e-30, flat.dtype)
        tol = 50 * jnp.finfo(flat.dtype).eps

        def cond(carry):
            x, r, it = carry
            return jnp.logical_and(jnp.linalg.norm(r.reshape(-1)) > tol * rhs_norm, it < 50)

        def body(carry):
            x, r, it = carry
            x = x + direct(r)
            return x, residual(x), it + 1

        x, _, _ = jax.lax.while_loop(cond, body, (x, r, jnp.asarray(0)))
        return x.reshape(flat.shape)

    # -- apply -----------------------------------------------------------
    def enable_pallas_dia(self, Tr=32, interpret=False):
        """Route ``apply`` through the tiled Pallas DIA kernel
        (ops/pallas/dia.py) instead of the roll-based SpMV.  Measured on
        hardware the XLA roll path is FASTER at HBM-bound sizes (it fuses
        the shifted reads), so rolls stay the default; the kernel is kept
        as the explicit opt-in for configurations where per-diagonal
        streaming wins (many diagonals, u resident in VMEM-scale tiles)."""
        if self.dia is None:
            from pysdc_tpu.core.errors import ProblemError

            raise ProblemError('Pallas DIA apply needs a DIA-convertible matrix')
        self._pallas_dia = (Tr, bool(interpret))
        return self

    def disable_pallas_dia(self):
        self._pallas_dia = None
        return self

    def _mv(self, flat):
        """A @ flat over the trailing (flattened-grid) axis."""
        cfg = getattr(self, '_pallas_dia', None)
        if cfg is not None and self.dia is not None:
            from pysdc_tpu.ops.pallas.dia import dia_spmv

            return dia_spmv(self.dia, flat, Tr=cfg[0], interpret=cfg[1])
        mv = self.dia if self.dia is not None else self.ell
        return mv.spmv(flat)

    def apply(self, u):
        """A @ u; trailing axes are the grid, leading axes batch."""
        flat = u.reshape(u.shape[: u.ndim - len(self.grid_shape)] + (self.n,))
        return self._mv(flat).reshape(u.shape)

    def apply_bsr(self, u, br=None, interpret=False):
        """Pallas block-sparse path; ``u`` (n,) or (n, B) operator-axis-first.

        ``br`` auto-picks the largest MXU-aligned block size that divides
        the grid: large blocks amortize Pallas grid-step overhead and turn
        each step into an MXU-sized product, so the kernel streams its
        dense blocks at HBM rate (br=8: ~0.1 Gnnz/s grid-bound; br=256:
        ~23 Gnnz/s measured on hardware).  The blocked operator is built
        once and cached.
        """
        from pysdc_tpu.ops.pallas.spmv import bsr_spmm

        if br is None:
            br = next((b for b in (256, 128) if self.n % b == 0), 8)
        if getattr(self, '_bsr', None) is None or self._bsr.br != br:
            self._bsr = BSR.from_csr(self.A, br, br)
        u2 = u[:, None] if u.ndim == 1 else u
        y = bsr_spmm(self._bsr, u2, interpret=interpret)
        return y[:, 0] if u.ndim == 1 else y

    # -- shifted solve -----------------------------------------------------
    def solve_shifted(self, rhs, factor, x0=None, tol=1e-12, maxiter=1000, node=None):
        """Solve ``(I - factor*A) x = rhs``; factor is a traced scalar.

        ``node`` (static int) selects a prepared per-node factorization when
        :meth:`prepare_node_shifts` ran — substitution only, no per-solve
        reduction."""
        batch_shape = rhs.shape[: rhs.ndim - len(self.grid_shape)]
        flat = rhs.reshape(batch_shape + (self.n,))

        if self._solver == 'tridiag':
            lo, dg, up = (jnp.asarray(v) for v in self._tri)
            x = banded.tridiag_pcr_solve(-factor * lo, 1.0 - factor * dg, -factor * up, flat)
        elif self._solver == 'cyclic_tridiag':
            lo, dg, up = (jnp.asarray(v) for v in self._tri)
            c_lo, c_up = self._corners
            x = banded.cyclic_tridiag_solve(
                -factor * lo, 1.0 - factor * dg, -factor * up,
                -factor * c_lo, -factor * c_up, flat,
            )
        elif self._solver == 'banded':
            x = banded.banded_shifted_solve(self._bands, *self._bw, flat, factor)
        elif self._solver == 'block_tridiag':
            if node is not None and self._prep is not None:
                x = self._prepared_solve(flat, factor, node)
            else:
                sub, dg, sup = (jnp.asarray(v) for v in self._blocks)
                b = dg.shape[-1]
                eye = jnp.eye(b, dtype=dg.dtype)[None]
                fac = banded.block_cr_factor(-factor * sub, eye - factor * dg, -factor * sup)
                nb = self.n // self._block
                shaped = flat.reshape(flat.shape[:-1] + (nb, self._block))
                x = banded.block_cr_solve(fac, shaped).reshape(flat.shape)
        elif self._solver == 'pcg':
            x, _ = self._pcg(flat, factor, tol, maxiter, x0)
        else:
            from jax.scipy.sparse.linalg import cg

            def mv(v):
                return v - factor * self._mv(v)

            x0f = None if x0 is None else x0.reshape(batch_shape + (self.n,))
            # floor the tolerance at the dtype's reachable residual level:
            # the 1e-12 default would spin f32 solves to maxiter
            tol = max(tol, 50 * float(jnp.finfo(rhs.dtype).eps))
            x, _ = cg(mv, flat, x0=x0f, tol=tol, maxiter=maxiter)
        return x.reshape(rhs.shape)

    def _pcg(self, flat, factor, tol, maxiter, x0=None):
        """Preconditioned CG on ``(I - factor*A) x = flat``.

        The preconditioner is one exact spectral solve of the separable
        surrogate; convergence depth is set by the coefficient variation,
        not the grid (kappa <= max(a)/min(a) of the generalized spectrum).
        Returns ``(x, iterations)`` — the iteration count is a device
        scalar, surfaced through :meth:`solve_shifted_info` so solver work
        is observable (the reference counts Krylov work the same way,
        generic_ND_FD.py:208-240)."""
        import jax

        tol = max(tol, 50 * float(jnp.finfo(flat.dtype).eps))

        def mv(v):
            return v - factor * self._mv(v)

        def M(r):
            grid = r.reshape(r.shape[:-1] + self.grid_shape)
            return self.precond.solve_shifted(grid, factor).reshape(r.shape)

        if x0 is None:
            x = jnp.zeros_like(flat)
            r = flat
        else:
            x = x0.reshape(flat.shape)
            r = flat - mv(x)
        b_norm = jnp.linalg.norm(flat.reshape(-1))

        # deferred-z formulation: the preconditioner solve runs at the TOP
        # of the body, so the classical loop's final (discarded) M(r) after
        # the last residual update never executes — one spectral solve per
        # actual iteration instead of iterations+1.  Same Krylov space,
        # same iterates.
        p0 = jnp.zeros_like(flat)
        rz0 = jnp.ones((), flat.dtype)

        def cond(carry):
            x, r, p, rz, k = carry
            return jnp.logical_and(
                jnp.linalg.norm(r.reshape(-1)) > tol * b_norm, k < maxiter
            )

        def body(carry):
            x, r, p, rz_prev, k = carry
            z = M(r)
            rz = jnp.sum(r * z)
            beta = jnp.where(k == 0, jnp.zeros((), rz.dtype), rz / rz_prev)
            p = z + beta * p
            Ap = mv(p)
            alpha = rz / jnp.sum(p * Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            return x, r, p, rz, k + 1

        x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p0, rz0, jnp.asarray(0)))
        return x, k

    def solve_shifted_info(self, rhs, factor, tol=1e-12, maxiter=1000):
        """Like :meth:`solve_shifted` but also returns the Krylov iteration
        count (0 for the direct lanes) — work made visible."""
        if self._solver != 'pcg':
            return self.solve_shifted(rhs, factor), jnp.asarray(0)
        batch_shape = rhs.shape[: rhs.ndim - len(self.grid_shape)]
        flat = rhs.reshape(batch_shape + (self.n,))
        x, k = self._pcg(flat, factor, tol, maxiter)
        return x.reshape(rhs.shape), k

    @property
    def solver_kind(self):
        return self._solver


def assemble_ndim_fd(per_dim: list[dict], scale: float = 1.0):
    """Kronecker-sum assembly of an ND FD operator as CSR.

    Same inputs as :class:`~pysdc_tpu.ops.linop.SeparableFDOperator`; the
    result is the explicit sparse matrix (plus the flattened boundary RHS),
    built entirely with the from-scratch CSR algebra — the reference's
    scipy-kron construction (``problem_helper.py:42-245``) without scipy.
    """
    shape = tuple(d['size'] for d in per_dim)
    ndim = len(per_dim)
    n_total = int(np.prod(shape))
    A_total = None
    b_total = np.zeros(shape)

    for axis, d in enumerate(per_dim):
        A1, b1 = fd_matrix_1d(
            d.get('derivative', 2), d.get('order', 2), d['size'], d['dx'],
            bc=d.get('bc', 'periodic'), stencil_type=d.get('stencil_type', 'center'),
            steps=d.get('steps'), bc_params=d.get('bc_params'),
        )
        term = CSR.from_dense(A1, tol=1e-15)
        for left_ax in range(axis - 1, -1, -1):
            term = CSR.eye(shape[left_ax]).kron(term)
        for right_ax in range(axis + 1, ndim):
            term = term.kron(CSR.eye(shape[right_ax]))
        A_total = term if A_total is None else A_total + term
        shape_b = [1] * ndim
        shape_b[axis] = shape[axis]
        b_total = b_total + b1.reshape(shape_b)

    A_total = A_total.scale(scale).prune(0.0)
    bc_rhs = scale * b_total.reshape(n_total)
    return A_total, (bc_rhs if np.any(bc_rhs) else None)


class SparseFDOperator(SparseOperator):
    """Drop-in sparse counterpart of
    :class:`~pysdc_tpu.ops.linop.SeparableFDOperator`: same ``per_dim``
    construction, same ``apply``/``solve_shifted``/``bc_rhs`` interface, but
    the operator is an assembled CSR matrix solved by structured
    factorization — BASELINE configs run through it with ``backend='sparse'``
    on the FD problem classes."""

    def __init__(self, per_dim: list[dict], scale: float = 1.0, solver='auto', block=None,
                 precond=None):
        A, bc_rhs = assemble_ndim_fd(per_dim, scale=scale)
        shape = tuple(d['size'] for d in per_dim)
        if bc_rhs is not None:
            bc_rhs = bc_rhs.reshape(shape)
        super().__init__(A, grid_shape=shape, bc_rhs=bc_rhs, block=block, solver=solver,
                         precond=precond)
        self.ndim = len(shape)
        self.scale = float(scale)

    def solve_shifted_cg(self, rhs, factor, x0, tol=1e-12, maxiter=10000):
        return self.solve_shifted(rhs, factor, x0=x0, tol=tol, maxiter=maxiter)

    def solve_shifted_gmres(self, rhs, factor, x0, tol=1e-12, maxiter=100):
        from jax.scipy.sparse.linalg import gmres

        batch_shape = rhs.shape[: rhs.ndim - len(self.grid_shape)]
        flat = rhs.reshape(batch_shape + (self.n,))

        def mv(v):
            return v - factor * self._mv(v)

        x, _ = gmres(mv, flat, x0=x0.reshape(batch_shape + (self.n,)), tol=tol, maxiter=maxiter)
        return x.reshape(rhs.shape)


def variable_diffusion_matrix(a_faces, dx, bc='dirichlet'):
    """1D conservative variable-coefficient diffusion: rows of
    ``d/dx(a(x) du/dx)`` with face-centered coefficients ``a_{i+1/2}``
    (``a_faces`` has size n+1).  Dirichlet (homogeneous) or periodic."""
    a = np.asarray(a_faces, dtype=float)
    n = len(a) - 1
    inv = 1.0 / dx**2
    lo = a[:-1] * inv          # multiplies u[i-1]
    up = a[1:] * inv           # multiplies u[i+1]
    dg = -(a[:-1] + a[1:]) * inv
    if bc == 'periodic':
        rows = np.concatenate([np.arange(n)] * 3)
        cols = np.concatenate([(np.arange(n) - 1) % n, np.arange(n), (np.arange(n) + 1) % n])
        vals = np.concatenate([lo, dg, up])
        return CSR.from_coo(rows, cols, vals, (n, n))
    return CSR.diags([lo[1:], dg, up[:-1]], [-1, 0, 1], (n, n))
