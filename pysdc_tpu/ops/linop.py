"""Linear operators for method-of-lines problems, TPU-native.

The reference assembles scipy sparse matrices and factorizes them with
``splu`` per (dt*q) shift (``generic_ND_FD.py:208-240``).  On TPU, sparse
triangular solves map poorly to the hardware, so the same separable
(tensor-product) structure is exploited *directly*:

  A = sum_d I (x) ... (x) A_d (x) ... (x) I

  - periodic dims: A_d is circulant -> matrix-free stencil application via
    ``jnp.roll`` and *exact* direct solves by FFT diagonalization
    (O(N log N), XLA-fused, no factorization cache needed — the shift
    ``factor`` stays a traced scalar, so adaptive dt never retraces).
  - general dims (Dirichlet/Neumann): A_d = V_d L_d V_d^{-1} eigen-factorized
    once on the host; applies and solves become dense per-axis matmuls that
    run on the MXU — the TPU replacement for sparse LU.

``(I - factor*A) x = rhs`` for *any* traced scalar ``factor`` (including 0)
is thus one transform, one elementwise divide, one inverse transform.
Iterative CG/GMRES/BiCGStab paths are kept for parity with the reference's
``solver_type`` parameter and for non-separable operators.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ProblemError
from pysdc_tpu.core.precision import COEFF_PRECISION
from pysdc_tpu.ops.fd import fd_matrix_1d, get_finite_difference_stencil, stencil_symbol


class SeparableFDOperator:
    """Sum of per-axis 1D FD operators with per-axis BCs (static host object).

    Parameters
    ----------
    per_dim:
        list over dimensions of dicts with keys
        ``size, dx, derivative, order, stencil_type, steps, bc, bc_params``.
        ``bc`` is 'periodic' or (anything containing) 'dirichlet'/'neumann'.
    scale:
        global prefactor (e.g. diffusion coefficient nu).
    """

    def __init__(self, per_dim: list[dict], scale: float = 1.0, dtype=None, pallas: str | bool = 'auto'):
        self.ndim = len(per_dim)
        self.scale = float(scale)
        self.dtype = dtype
        self.shape = tuple(d['size'] for d in per_dim)
        self._dims = []
        self.bc_rhs = None  # inhomogeneous-BC vector (sum over dims, scaled)
        nnz = 0

        bc_vec_total = np.zeros(self.shape)
        for axis, d in enumerate(per_dim):
            size, dx = d['size'], d['dx']
            bc = d.get('bc', 'periodic')
            bc0 = bc[0] if isinstance(bc, tuple) else bc
            derivative = d.get('derivative', 2)
            order = d.get('order', 2)
            stencil_type = d.get('stencil_type', 'center')
            steps = d.get('steps')
            if bc0 == 'periodic':
                coeff, offs = get_finite_difference_stencil(derivative, order, stencil_type, steps)
                lam = stencil_symbol(coeff, offs, size, dx, derivative)
                self._dims.append(
                    dict(kind='circulant', axis=axis, coeff=coeff / dx**derivative, offs=offs, lam=lam)
                )
                nnz += len(coeff)
            else:
                A1, b1 = fd_matrix_1d(
                    derivative, order, size, dx, bc=bc, stencil_type=stencil_type, steps=steps,
                    bc_params=d.get('bc_params'),
                )
                if np.allclose(A1, A1.T, atol=1e-14 * np.max(np.abs(A1))):
                    # symmetric (e.g. 2nd-order Dirichlet Laplacian): orthogonal
                    # eigenbasis, V^{-1} = V^T exactly — no conditioning loss
                    lam, V = np.linalg.eigh(A1)
                    Vinv = V.T
                else:
                    lam, V = np.linalg.eig(A1)
                    cond = np.linalg.cond(V)
                    if cond > 1e10:
                        raise ProblemError(
                            f'1D FD matrix along axis {axis} is too ill-conditioned for the eigen '
                            f'direct solver (cond(V)={cond:.1e}); use an iterative solver_type'
                        )
                    Vinv = np.linalg.inv(V)
                    if np.max(np.abs(lam.imag)) < 1e-12 * max(np.max(np.abs(lam.real)), 1.0):
                        lam, V, Vinv = lam.real, V.real, Vinv.real
                self._dims.append(dict(kind='dense', axis=axis, A=A1, lam=lam, V=V, Vinv=Vinv))
                nnz += int(np.mean(np.count_nonzero(A1, axis=1)))
                # broadcast the 1D boundary vector into the ND grid
                shape_b = [1] * self.ndim
                shape_b[axis] = size
                bc_vec_total = bc_vec_total + b1.reshape(shape_b)

        #: mean nonzeros per matrix row of the assembled ND operator
        self.nnz_per_dof = nnz
        if np.any(bc_vec_total):
            self.bc_rhs = jnp.asarray(self.scale * bc_vec_total)

        #: full spectral grid Lambda = sum_d lam_d (broadcast), scaled
        lam_nd = np.zeros(self.shape, dtype=complex)
        for d in self._dims:
            shape_b = [1] * self.ndim
            shape_b[d['axis']] = self.shape[d['axis']]
            lam_nd = lam_nd + d['lam'].reshape(shape_b)
        if np.max(np.abs(lam_nd.imag)) < 1e-12 * max(np.max(np.abs(lam_nd.real)), 1.0):
            lam_nd = lam_nd.real
        self._lam_nd = lam_nd
        self.all_periodic = all(d['kind'] == 'circulant' for d in self._dims)
        # real-symbol all-periodic operators get a cheaper rfft solve path
        self._rfft_ok = self.all_periodic and not np.iscomplexobj(lam_nd)
        if self.all_periodic and not np.iscomplexobj(lam_nd):
            self._lam_rfft = lam_nd[..., : self.shape[-1] // 2 + 1]

        # 2D all-periodic operators qualify for the fused Pallas cross-stencil
        # apply: one pass over HBM for all taps instead of one roll per tap.
        # pallas='auto' uses it on TPU only (the CPU fallback interprets the
        # kernel, which is for tests, not speed); True forces it everywhere.
        self._cross_terms = None
        if self.ndim == 2 and self.all_periodic:
            # scale folded into the taps: one fused pass, no trailing
            # elementwise multiply over the output
            self._cross_terms = tuple(
                (tuple(float(self.scale * c) for c in d['coeff']), tuple(int(s) for s in d['offs']))
                for d in self._dims
            )
        self._pallas = pallas

    def disable_rfft(self):
        """Route solves through the full complex-FFT path.

        Public escape hatch for an XLA bug: the fft thunk fails a layout
        RET_CHECK when an rfft/irfft operand is GSPMD-sharded on the
        host-emulated CPU mesh (observed with
        --xla_force_host_platform_device_count).  Sharded controllers call
        this instead of reaching into private state; the full-FFT path is
        mathematically identical, just ~2x the spectral traffic."""
        self._rfft_ok = False

    def enable_rfft(self):
        """Re-enable the half-spectrum path when the operator supports it."""
        self._rfft_ok = self.all_periodic and hasattr(self, '_lam_rfft')

    def disable_pallas(self):
        """Route ``apply`` through the roll path (e.g. when the operand is
        GSPMD-sharded — pallas_call is an opaque custom call XLA cannot
        partition automatically; sharded callers use halo_cross_apply)."""
        self._pallas = False

    def enable_pallas(self, mode='auto'):
        self._pallas = mode

    def enable_halo(self, mesh, axis: str = 'space'):
        """Space-decomposed apply: one rx-deep halo ppermute per direction
        with ghost-independent taps overlapping the exchange
        (:func:`~pysdc_tpu.ops.pallas.stencil.halo_cross_apply_batched`).
        For 2D all-periodic operators on space-only meshes; other
        configurations keep the GSPMD roll path."""
        if self._cross_terms is None:
            raise ProblemError('halo apply needs a 2D all-periodic cross-stencil operator')
        self._halo = (mesh, axis)

    def disable_halo(self):
        self._halo = None

    def _use_pallas_apply(self, u) -> bool:
        if self._cross_terms is None or self._pallas is False:
            return False
        if jnp.iscomplexobj(u):
            return False
        from pysdc_tpu.ops.pallas.stencil import _on_tpu, cross_stencil_aligned

        # Mosaic rejects grids without an (8, 128)-aligned tiling on real
        # hardware (any coarse MLSDC level <= 64 wide) — roll path instead
        if not cross_stencil_aligned(*self.shape[-2:]):
            return False
        if self._pallas == 'auto':
            return _on_tpu()
        return True

    # ------------------------------------------------------------------
    def apply(self, u):
        """A @ u, matrix-free.  2D all-periodic operators dispatch to the
        fused Pallas cross-stencil kernel on TPU (one HBM pass for all taps);
        otherwise periodic axes use rolls (VPU-fused) and general axes one
        dense matmul each (MXU).  BC rhs vector is NOT included (matches the
        reference, which keeps b separate)."""
        if getattr(self, '_halo', None) is not None and not jnp.iscomplexobj(u) and u.ndim >= 2:
            from pysdc_tpu.ops.pallas.stencil import halo_cross_apply_batched

            mesh, axis = self._halo
            return halo_cross_apply_batched(u, mesh, self._cross_terms, axis=axis)
        if self._use_pallas_apply(u):
            from pysdc_tpu.ops.pallas.stencil import cross_stencil_2d

            return cross_stencil_2d(u, self._cross_terms)  # scale is in the taps
        offset = u.ndim - self.ndim  # support leading batch axes
        out = jnp.zeros_like(u)
        for d in self._dims:
            ax = d['axis'] + offset
            if d['kind'] == 'circulant':
                acc = jnp.zeros_like(u)
                for c, s in zip(d['coeff'], d['offs']):
                    # float(): numpy scalars would promote float32 fields
                    acc = acc + float(c) * jnp.roll(u, -int(s), axis=ax)
                out = out + acc
            else:
                A = jnp.asarray(d['A'], dtype=u.dtype)
                out = out + jnp.moveaxis(jnp.tensordot(A, u, axes=(1, ax), precision=COEFF_PRECISION), 0, ax)
        return self.scale * out

    @staticmethod
    def _mat_dtype(mat, x):
        """Precision of ``x``, complexified only if ``mat`` is complex —
        keeps float32 states in complex64 instead of silently promoting
        every constant to the numpy-default float64/complex128."""
        base = jnp.real(x).dtype
        return jnp.promote_types(base, jnp.complex64) if np.iscomplexobj(mat) else base

    def _forward(self, x):
        """Transform to the operator's diagonal basis."""
        offset = x.ndim - self.ndim
        for d in self._dims:
            ax = d['axis'] + offset
            if d['kind'] == 'circulant':
                x = jnp.fft.fft(x, axis=ax)
            else:
                M = jnp.asarray(d['Vinv'], self._mat_dtype(d['Vinv'], x))
                x = jnp.moveaxis(jnp.tensordot(M, x, axes=(1, ax), precision=COEFF_PRECISION), 0, ax)
        return x

    def _backward(self, x):
        offset = x.ndim - self.ndim
        for d in self._dims:
            ax = d['axis'] + offset
            if d['kind'] == 'circulant':
                x = jnp.fft.ifft(x, axis=ax)
            else:
                M = jnp.asarray(d['V'], self._mat_dtype(d['V'], x))
                x = jnp.moveaxis(jnp.tensordot(M, x, axes=(1, ax), precision=COEFF_PRECISION), 0, ax)
        return x

    def solve_shifted(self, rhs, factor):
        """Exact direct solve of ``(I - factor * A) x = rhs``.

        ``factor`` is a traced scalar (per-node dt*q values vmap over it).
        Real input on a real-symbol periodic operator takes the rfft path
        (half the spectral traffic)."""
        if self._rfft_ok and not jnp.iscomplexobj(rhs):
            axes = tuple(range(rhs.ndim - self.ndim, rhs.ndim))
            rhat = jnp.fft.rfftn(rhs, axes=axes)
            lam = jnp.asarray(self._lam_rfft, rhs.dtype)
            # pin the denominator to the rhs real dtype: a wider traced
            # `factor` (f64 under x64) would promote the quotient to c128
            # against c64 data elsewhere in the program
            denom = (1.0 - factor * self.scale * lam).astype(rhs.dtype)
            return jnp.fft.irfftn(rhat / denom, s=self.shape, axes=axes).astype(rhs.dtype)
        lam = jnp.asarray(self._lam_nd, self._mat_dtype(self._lam_nd, rhs))
        xhat = self._forward(rhs)
        denom = 1.0 - factor * self.scale * lam
        xhat = xhat / denom
        x = self._backward(xhat)
        if not jnp.iscomplexobj(rhs):
            x = jnp.real(x)
        return x.astype(rhs.dtype)

    def solve_shifted_cg(self, rhs, factor, x0, tol=1e-12, maxiter=10000):
        """Iterative CG path (parity with reference solver_type='CG')."""
        from jax.scipy.sparse.linalg import cg

        def mv(x):
            return x - factor * self.apply(x)

        x, _ = cg(mv, rhs, x0=x0, tol=tol, maxiter=maxiter)
        return x

    def solve_shifted_gmres(self, rhs, factor, x0, tol=1e-12, maxiter=100):
        from jax.scipy.sparse.linalg import gmres

        def mv(x):
            return x - factor * self.apply(x)

        x, _ = gmres(mv, rhs, x0=x0, tol=tol, maxiter=maxiter)
        return x

    @property
    def eigenvalues(self):
        """Full ND symbol (scaled) — useful for exact solutions/tests."""
        return self.scale * self._lam_nd

    # -- diagonal-basis interface (ops/diag_sdc.py multi-sweep fast path) --
    @property
    def diag_symbol(self):
        """Scaled symbol in the basis used by diag_forward (rfft-reduced
        when the operator is all-periodic with a real symbol)."""
        return self.scale * (self._lam_rfft if self._rfft_ok else self._lam_nd)

    def diag_forward(self, x):
        """Transform (trailing spatial axes; leading axes batch) to the
        operator's diagonal basis."""
        if self._rfft_ok and not jnp.iscomplexobj(x):
            axes = tuple(range(x.ndim - self.ndim, x.ndim))
            return jnp.fft.rfftn(x, axes=axes)
        return self._forward(x)

    def diag_backward(self, xhat, dtype, real: bool):
        if self._rfft_ok and real:
            axes = tuple(range(xhat.ndim - self.ndim, xhat.ndim))
            return jnp.fft.irfftn(xhat, s=self.shape, axes=axes).astype(dtype)
        x = self._backward(xhat)
        if real:
            x = jnp.real(x)
        return x.astype(dtype)


class SpectralOperator:
    """Exact spectral differential operator on a periodic box.

    TPU-native analog of the reference's mpi4py-fft Laplacians
    (``generic_MPIFFT_Laplacian.py:10-177``): ``apply`` multiplies by the
    symbol in Fourier space, ``solve_shifted`` divides by ``1 - factor*symbol``
    — both exact, both O(N log N), the shift a traced scalar.

    Parameters
    ----------
    shape:     spatial grid shape.
    lengths:   box lengths per dimension (default 1.0 each).
    symbol_fn: maps the wavenumber grids (k_0, ..., k_{d-1}) to the symbol
               array (e.g. ``lambda *k: -sum(ki**2 for ki in k)`` for the
               Laplacian).  Wavenumbers include the 2*pi/L factor.
    scale:     global prefactor.
    """

    def __init__(self, shape, symbol_fn=None, lengths=None, scale: float = 1.0):
        self.shape = tuple(shape)
        self.ndim = len(self.shape)
        self.scale = float(scale)
        lengths = (1.0,) * self.ndim if lengths is None else tuple(lengths)
        ks = []
        for n, L in zip(self.shape, lengths):
            ks.append(2.0 * np.pi * np.fft.fftfreq(n, d=1.0 / n) / L)
        grids = np.meshgrid(*ks, indexing='ij')
        if symbol_fn is None:
            symbol_fn = lambda *k: -sum(ki**2 for ki in k)
        self.symbol = np.asarray(symbol_fn(*grids)) * self.scale
        self.nnz_per_dof = 2 * self.ndim + 1  # FD-equivalent accounting

    def _axes(self, u):
        return tuple(range(u.ndim - self.ndim, u.ndim))

    def apply(self, u):
        axes = self._axes(u)
        uhat = jnp.fft.fftn(u, axes=axes)
        out = jnp.fft.ifftn(uhat * jnp.asarray(self.symbol), axes=axes)
        if not jnp.iscomplexobj(u):
            out = jnp.real(out)
        return out.astype(u.dtype)

    def solve_shifted(self, rhs, factor):
        axes = self._axes(rhs)
        rhat = jnp.fft.fftn(rhs, axes=axes)
        xhat = rhat / (1.0 - factor * jnp.asarray(self.symbol))
        x = jnp.fft.ifftn(xhat, axes=axes)
        if not jnp.iscomplexobj(rhs):
            x = jnp.real(x)
        return x.astype(rhs.dtype)

    # -- diagonal-basis interface (ops/diag_sdc.py multi-sweep fast path) --
    @property
    def diag_symbol(self):
        return jnp.asarray(self.symbol)

    def diag_forward(self, x):
        return jnp.fft.fftn(x, axes=self._axes(x))

    def diag_backward(self, xhat, dtype, real: bool):
        x = jnp.fft.ifftn(xhat, axes=self._axes(xhat))
        if real:
            x = jnp.real(x)
        return x.astype(dtype)
