"""TPU-native sparse linear algebra: containers, SpGEMM, and device formats.

This is the north-star sparse layer (BASELINE.json): the reference builds
scipy CSR operators and factorizes them with ``splu``
(``generic_ND_FD.py:17-240``); here the *assembly* algebra (COO/CSR, add,
scale, transpose, SpGEMM, Kronecker products, Galerkin RAP) is implemented
from scratch in vectorized numpy for host/setup time, and the *execution*
formats are TPU pytrees:

  - :class:`ELL` — padded fixed-width rows; SpMV is one XLA gather + a
    VPU multiply-reduce.  Works for any sparsity pattern; batched over the
    collocation-node axis it becomes an SpMM.
  - :class:`BSR` — block rows of dense ``(br, bc)`` blocks with *contiguous*
    column segments, so the Pallas kernel (:mod:`pysdc_tpu.ops.pallas.spmv`)
    reads ``u`` with dynamic slices (no gather) and runs the block product on
    the MXU.

Factorization lives in :mod:`pysdc_tpu.ops.banded` (banded LU / block
Thomas), mirroring the role of the reference's cached ``splu``
(``generic_ND_FD.py:208-240``) without host round-trips: the shift ``factor``
stays a traced scalar and the factorization is fused into the solve program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import ProblemError


# ======================================================================
# Host-side CSR container (setup-time algebra, pure numpy, from scratch)
# ======================================================================
class CSR:
    """Compressed-sparse-row matrix with explicit, vectorized-numpy kernels.

    Intentionally *not* scipy: assembly, SpGEMM, kron, and RAP are part of
    the from-scratch sparse library (north star).  All entries are kept
    sorted by (row, col) with no duplicates and no explicit zeros unless
    requested.
    """

    __slots__ = ('data', 'indices', 'indptr', 'shape')

    def __init__(self, data, indices, indptr, shape):
        self.data = np.asarray(data, dtype=float)
        self.indices = np.asarray(indices, dtype=np.int32)
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.shape = tuple(shape)

    # -- constructors ---------------------------------------------------
    @classmethod
    def from_coo(cls, rows, cols, vals, shape, sum_duplicates=True):
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=float)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if sum_duplicates and len(rows):
            key_new = np.empty(len(rows), dtype=bool)
            key_new[0] = True
            key_new[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            group = np.cumsum(key_new) - 1
            vals = np.bincount(group, weights=vals, minlength=group[-1] + 1)
            rows, cols = rows[key_new], cols[key_new]
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        return cls(vals, cols, indptr, shape)

    @classmethod
    def from_dense(cls, A, tol=0.0):
        A = np.asarray(A, dtype=float)
        rows, cols = np.nonzero(np.abs(A) > tol)
        return cls.from_coo(rows, cols, A[rows, cols], A.shape)

    @classmethod
    def eye(cls, n, value=1.0):
        idx = np.arange(n)
        return cls(np.full(n, value), idx, np.arange(n + 1), (n, n))

    @classmethod
    def diags(cls, diagonals, offsets, shape):
        """Banded assembly from (diagonal values, offsets) pairs."""
        rows, cols, vals = [], [], []
        n, m = shape
        for diag, off in zip(diagonals, offsets):
            r0, c0 = (0, off) if off >= 0 else (-off, 0)
            length = min(n - r0, m - c0)
            if length <= 0:
                continue
            diag = np.asarray(diag, dtype=float)
            diag = diag[:length] if diag.ndim == 1 and diag.size > length else np.broadcast_to(diag, (length,))
            rows.append(np.arange(r0, r0 + length))
            cols.append(np.arange(c0, c0 + length))
            vals.append(diag)
        return cls.from_coo(np.concatenate(rows), np.concatenate(cols), np.concatenate(vals), shape)

    # -- basic algebra ----------------------------------------------------
    @property
    def nnz(self):
        return len(self.data)

    @property
    def row_lengths(self):
        return np.diff(self.indptr)

    def row_of(self):
        """Expanded row index per stored entry."""
        return np.repeat(np.arange(self.shape[0], dtype=np.int64), self.row_lengths)

    def to_dense(self):
        out = np.zeros(self.shape)
        out[self.row_of(), self.indices] = self.data
        return out

    def diagonal(self):
        rows = self.row_of()
        mask = rows == self.indices
        out = np.zeros(min(self.shape))
        out[rows[mask]] = self.data[mask]
        return out

    def scale(self, alpha):
        return CSR(self.data * alpha, self.indices, self.indptr, self.shape)

    def __add__(self, other):
        if not isinstance(other, CSR) or self.shape != other.shape:
            raise ProblemError('CSR addition needs two equal-shape CSR matrices')
        rows = np.concatenate([self.row_of(), other.row_of()])
        cols = np.concatenate([self.indices, other.indices])
        vals = np.concatenate([self.data, other.data])
        return CSR.from_coo(rows, cols, vals, self.shape)

    def transpose(self):
        return CSR.from_coo(self.indices, self.row_of(), self.data, self.shape[::-1])

    @property
    def T(self):
        return self.transpose()

    def prune(self, tol=0.0):
        keep = np.abs(self.data) > tol
        return CSR.from_coo(self.row_of()[keep], self.indices[keep], self.data[keep], self.shape)

    # -- SpMV (host, for tests/reference) --------------------------------
    def dot_vec(self, x):
        x = np.asarray(x)
        return np.bincount(self.row_of(), weights=self.data * x[self.indices], minlength=self.shape[0])

    # -- SpGEMM -----------------------------------------------------------
    def matmul(self, other: 'CSR') -> 'CSR':
        """C = self @ other by row-expansion: every stored a_ik contributes
        a_ik * B[k, :]; contributions are merged coordinate-wise.  Fully
        vectorized (no Python loop over rows)."""
        if self.shape[1] != other.shape[0]:
            raise ProblemError(f'SpGEMM shape mismatch: {self.shape} @ {other.shape}')
        # for each entry (i, k, a) of self, expand the k-th row of other
        k = self.indices.astype(np.int64)
        counts = other.row_lengths[k]                     # entries contributed per a-entry
        if counts.sum() == 0:
            return CSR.from_coo([], [], [], (self.shape[0], other.shape[1]))
        out_rows = np.repeat(self.row_of(), counts)
        out_vals = np.repeat(self.data, counts)
        # gather the B-row segments: positions indptr[k] .. indptr[k]+counts
        seg_starts = other.indptr[k]
        # offsets 0..counts-1 within each segment, vectorized
        total = counts.sum()
        within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        pos = np.repeat(seg_starts, counts) + within
        out_cols = other.indices[pos].astype(np.int64)
        out_vals = out_vals * other.data[pos]
        return CSR.from_coo(out_rows, out_cols, out_vals, (self.shape[0], other.shape[1]))

    def __matmul__(self, other):
        return self.matmul(other)

    def kron(self, other: 'CSR') -> 'CSR':
        """Kronecker product — the assembly primitive for tensor-product ND
        operators (reference uses scipy.sparse.kron in problem_helper.py)."""
        ra, ca = self.row_of(), self.indices.astype(np.int64)
        rb, cb = other.row_of(), other.indices.astype(np.int64)
        na, ma = self.shape
        nb, mb = other.shape
        rows = (ra[:, None] * nb + rb[None, :]).ravel()
        cols = (ca[:, None] * mb + cb[None, :]).ravel()
        vals = (self.data[:, None] * other.data[None, :]).ravel()
        return CSR.from_coo(rows, cols, vals, (na * nb, ma * mb))

    # -- bandwidth info (feeds the banded factorization) ------------------
    def bandwidths(self):
        offs = self.indices.astype(np.int64) - self.row_of()
        if len(offs) == 0:
            return 0, 0
        return int(-offs.min()), int(offs.max())

    def to_banded(self):
        """Band storage: ``bands[j, i] = A[i, i + offsets[j]]`` with
        ``offsets = -lower..upper`` (rows padded with zeros out of range)."""
        lower, upper = self.bandwidths()
        n = self.shape[0]
        offsets = np.arange(-lower, upper + 1)
        bands = np.zeros((len(offsets), n))
        rows = self.row_of()
        offs = self.indices.astype(np.int64) - rows
        bands[offs + lower, rows] = self.data
        return bands, offsets

    def __repr__(self):
        return f'CSR(shape={self.shape}, nnz={self.nnz})'


def galerkin_product(P: CSR, A: CSR, R: CSR | None = None) -> CSR:
    """Coarse operator via the Galerkin triple product ``R A P`` (RAP).

    ``R`` defaults to ``P^T`` (variational coarsening).  This is the SpGEMM
    use-case the north star names for MLSDC/PFASST coarse operators; the
    reference builds the same product implicitly through re-discretization
    (``transfer_helper.py:91-139`` supplies the sparse P/R).
    """
    R = P.T if R is None else R
    return R.matmul(A).matmul(P).prune(1e-14)


# ======================================================================
# Device formats (pytrees)
# ======================================================================
@jax.tree_util.register_pytree_node_class
class ELL:
    """Padded fixed-width sparse rows on device.

    ``vals (n, k)`` and ``cols (n, k)`` with padding entries carrying value 0
    and an in-range column, so no masking is needed.  SpMV is
    ``(vals * u[cols]).sum(-1)`` — one XLA gather plus VPU work, and XLA
    batches it cleanly when ``u`` carries leading node axes.
    """

    def __init__(self, vals, cols, shape, nnz=None):
        self.vals = vals
        self.cols = cols
        self.shape = tuple(shape)
        self.nnz = nnz if nnz is not None else int(np.asarray(vals).size)

    @classmethod
    def from_csr(cls, A: CSR):
        n = A.shape[0]
        k = int(A.row_lengths.max()) if A.nnz else 1
        vals = np.zeros((n, k))
        cols = np.zeros((n, k), dtype=np.int32)
        lengths = A.row_lengths
        within = np.arange(A.nnz) - np.repeat(A.indptr[:-1], lengths)
        rows = A.row_of()
        vals[rows, within] = A.data
        cols[rows, within] = A.indices
        return cls(jnp.asarray(vals), jnp.asarray(cols), A.shape, nnz=A.nnz)

    def spmv(self, u):
        """y = A @ u over the trailing axis of u (leading axes batch)."""
        gathered = jnp.take(u, self.cols, axis=-1)          # (..., n, k)
        return jnp.sum(self.vals * gathered, axis=-1)

    def tree_flatten(self):
        return (self.vals, self.cols), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], nnz=aux[1])


@jax.tree_util.register_pytree_node_class
class DIA:
    """Diagonal sparse storage — the TPU-native format for FD matrices.

    ``offsets (k,)`` host ints and ``data (k, n)`` with
    ``data[j, i] = A[i, i + offsets[j]]`` (zero where the entry does not
    exist).  SpMV is ``sum_j data[j] * roll(u, -offsets[j])`` — k shifted
    fused multiply-adds on the VPU, no gather at all (ELL's gather costs
    ~50x more on TPU).  The mod-n roll semantics are exact for every
    matrix: out-of-range positions have zero coefficients by construction,
    and periodic wrap-around entries live on their own +-(n-m) diagonals
    where the roll lands them correctly.
    """

    def __init__(self, data, offsets, shape, nnz=None, grid=None):
        self.data = data              # (k, n) device array
        self.offsets = tuple(int(o) for o in offsets)  # static
        self.shape = tuple(shape)
        self.nnz = nnz if nnz is not None else int(np.asarray(data).size)
        #: ((nr, nc), ((dr, dc), ...)) when the 2D-grid roll path is valid
        self.grid = grid

    @classmethod
    def from_csr(cls, A: CSR, max_diags: int = 24):
        """Convert when the matrix lives on at most ``max_diags`` diagonals
        (FD stencils do); returns None otherwise."""
        n = A.shape[0]
        rows = A.row_of()
        offs = A.indices.astype(np.int64) - rows
        uniq = np.unique(offs)
        if uniq.size > max_diags:
            return None
        data = np.zeros((uniq.size, n))
        for j, o in enumerate(uniq):
            m = offs == o
            data[j, rows[m]] = A.data[m]
        return cls(jnp.asarray(data), uniq, A.shape, nnz=A.nnz)

    def with_grid(self, grid_shape):
        """Validate and enable the 2D-grid roll SpMV.

        Rolling the FLAT vector by ±1 / ±nc rotates the whole array through
        the lane axis — the dominant cost of the roll SpMV on TPU (measured
        ~8 Gnnz/s at 1024², ~7x under the streaming ceiling).  On a 2D grid
        the same diagonals decompose into (row, col) shifts ``k = dr*nc +
        dc`` that XLA lowers to cheap sublane/lane shifts of the (nr, nc)
        view — the exact op profile of the fused stencil apply.

        Validity: the circular 2D roll reads a different element than the
        flat shift exactly where a shift crosses a grid-row (or top/bottom)
        boundary; the matrix rows there must carry zero coefficients (true
        for any FD matrix whose stencil does not couple across those
        boundaries — Dirichlet/Neumann assemblies; periodic wrap entries
        live on their own diagonals and decompose consistently).  Checked
        entry-by-entry here; returns self unchanged if any diagonal fails.
        """
        if len(grid_shape) != 2:
            return self
        nr, nc = int(grid_shape[0]), int(grid_shape[1])
        n = self.shape[0]
        if nr * nc != n:
            return self
        data_h = np.asarray(self.data)
        i = np.arange(n)
        r, c = i // nc, i % nc
        decomp = []
        for j, k in enumerate(self.offsets):
            dr = int(np.round(k / nc))
            dc = k - dr * nc
            if abs(dc) >= nc or abs(dr) > nr:
                return self
            # flat-roll read index vs 2D-roll read index
            flat_idx = (i + k) % n
            grid_idx = ((r + dr) % nr) * nc + (c + dc) % nc
            differs = flat_idx != grid_idx
            if np.any(data_h[j][differs] != 0.0):
                return self
            decomp.append((dr, dc))
        return DIA(self.data, self.offsets, self.shape, nnz=self.nnz,
                   grid=((nr, nc), tuple(decomp)))

    def spmv(self, u):
        """y = A @ u over the trailing axis (leading axes batch)."""
        if self.grid is not None:
            (nr, nc), decomp = self.grid
            x2 = u.reshape(u.shape[:-1] + (nr, nc))
            out = None
            for j, (dr, dc) in enumerate(decomp):
                d = self.data[j].reshape(nr, nc)
                v = x2
                if dr != 0:
                    v = jnp.roll(v, -dr, axis=-2)
                if dc != 0:
                    v = jnp.roll(v, -dc, axis=-1)
                term = d * v
                out = term if out is None else out + term
            return out.reshape(u.shape)
        out = None
        for j, o in enumerate(self.offsets):
            d = self.data[j]
            term = d * (u if o == 0 else jnp.roll(u, -o, axis=-1))
            out = term if out is None else out + term
        return out

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape, self.nnz, self.grid)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], nnz=aux[2], grid=aux[3])


@jax.tree_util.register_pytree_node_class
class BSR:
    """Block-sparse rows of dense blocks with *contiguous* column segments.

    Per block-row ``i`` there are up to ``kb`` dense ``(br, bc)`` blocks; the
    j-th block multiplies ``u[seg[i, j] : seg[i, j] + bc]``.  Because the
    segment is contiguous, a kernel needs only dynamic slices of ``u``
    (TPU-friendly; no gather), and the block product runs on the MXU.
    Padding blocks are all-zero with segment start 0.
    """

    def __init__(self, blocks, seg_starts, shape, br, bc, nnz=None):
        self.blocks = blocks          # (nb, kb, br, bc)
        self.seg_starts = seg_starts  # (nb, kb) int32, multiples of bc
        self.shape = tuple(shape)
        self.br = br
        self.bc = bc
        self.nnz = nnz if nnz is not None else int(np.asarray(blocks).size)

    @classmethod
    def from_csr(cls, A: CSR, br: int, bc: int | None = None):
        bc = br if bc is None else bc
        n, m = A.shape
        if n % br or m % bc:
            raise ProblemError(f'BSR blocking {br}x{bc} must divide the shape {A.shape}')
        nb = n // br
        rows, cols = A.row_of(), A.indices.astype(np.int64)
        brow, bcol = rows // br, cols // bc
        # unique (block-row, block-col) pairs
        key = brow * (m // bc) + bcol
        uniq, inv = np.unique(key, return_inverse=True)
        ub_row, ub_col = uniq // (m // bc), uniq % (m // bc)
        counts = np.bincount(ub_row, minlength=nb)
        kb = int(counts.max()) if len(counts) else 1
        blocks = np.zeros((nb, kb, br, bc))
        segs = np.zeros((nb, kb), dtype=np.int32)
        slot_of = np.zeros(len(uniq), dtype=np.int64)
        # assign slots per block-row in column order (uniq is sorted by key)
        start = np.searchsorted(ub_row, np.arange(nb))
        slot_of = np.arange(len(uniq)) - start[ub_row]
        segs[ub_row, slot_of] = (ub_col * bc).astype(np.int32)
        blocks[ub_row[inv], slot_of[inv], rows % br, cols % bc] = A.data
        return cls(jnp.asarray(blocks), jnp.asarray(segs), A.shape, br, bc, nnz=A.nnz)

    def spmv(self, u):
        """Reference (non-Pallas) block SpMV; ``u`` 1D of length shape[1]."""
        kb = self.blocks.shape[1]
        idx = self.seg_starts[..., None] + jnp.arange(self.bc)[None, None, :]
        useg = u[idx]                                        # (nb, kb, bc)
        y = jnp.einsum('nkrc,nkc->nr', self.blocks, useg)
        return y.reshape(self.shape[0])

    def tree_flatten(self):
        return (self.blocks, self.seg_starts), (self.shape, self.br, self.bc, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1], aux[2], nnz=aux[3])
