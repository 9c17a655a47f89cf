"""Spatial mesh-to-mesh transfer via tensor-product Lagrange interpolation.

TPU-native counterpart of the reference ``mesh_to_mesh``
(``implementations/transfer_classes/TransferMesh.py``) and its matrix factory
(``helpers/transfer_helper.py:91-240``): per-dimension interpolation matrices
built from barycentric Lagrange weights on k nearest coarse neighbors
(periodic wrap or Dirichlet ghost padding), restriction = 0.5 * P^T.  Unlike
the reference's ND Kronecker sparse matrices, the ND transfer is applied as
one small dense matmul per axis (MXU-friendly, no sparse kron).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import TransferError
from pysdc_tpu.ops.lagrange import interpolation_matrix as _lagrange_matrix


def _neighbors_periodic(p: float, grid: np.ndarray, k: int) -> list[int]:
    """Indices of the k grid points closest to p on the unit circle."""
    d = np.abs(grid - p)
    d = np.minimum(d, np.minimum(np.abs(grid - p + 1.0), np.abs(grid - p - 1.0)))
    return sorted(np.argsort(d, kind='stable')[:k])


def _continue_periodic(grid: np.ndarray, nn: list[int]) -> np.ndarray:
    """Unwrap the neighbor coordinates so they are monotone around p."""
    nn = np.asarray(nn)
    out = [grid[nn[0]]]
    shift = 0.0
    for n, d in zip(nn[1:], np.diff(nn)):
        if d != 1:
            shift = -1.0
        out.append(grid[n] + shift)
    return np.asarray(out)


def interpolation_matrix_1d(
    fine_grid: np.ndarray, coarse_grid: np.ndarray, k: int = 2, periodic: bool = False, pad: int = 1
) -> np.ndarray:
    """(n_fine, n_coarse) interpolation matrix, k-point barycentric Lagrange.

    Non-periodic grids are padded with one ghost point per side (the
    homogeneous-Dirichlet boundary values), whose columns are dropped."""
    n_f = fine_grid.size
    if periodic:
        M = np.zeros((n_f, coarse_grid.size))
        mean_f = np.mean(fine_grid)
        for i, p in enumerate(fine_grid):
            exact = np.isclose(coarse_grid, p, atol=1e-14)
            if exact.any():
                M[i, np.argmax(exact)] = 1.0
                continue
            nn = _neighbors_periodic(p, coarse_grid, k)
            pts = _continue_periodic(coarse_grid, nn)
            if p > mean_f and not (pts[0] <= p <= pts[-1]):
                pts = pts + 1.0
            M[i, nn] = _lagrange_matrix(pts, np.array([p]))[0]
        return M

    dxl = coarse_grid[1] - coarse_grid[0] if coarse_grid.size > 1 else coarse_grid[0]
    padded = np.concatenate([[coarse_grid[0] - dxl], coarse_grid, [coarse_grid[-1] + dxl]])
    M = np.zeros((n_f, padded.size))
    for i, p in enumerate(fine_grid):
        exact = np.isclose(padded, p, atol=1e-14)
        if exact.any():
            M[i, np.argmax(exact)] = 1.0
            continue
        nn = sorted(np.argsort(np.abs(padded - p), kind='stable')[:k])
        M[i, nn] = _lagrange_matrix(padded[nn], np.array([p]))[0]
    return M[:, pad:-pad] if pad > 0 else M


class MeshTransfer:
    """Space transfer with per-axis dense interpolation/restriction matrices.

    params: iorder (default 2), rorder (2), periodic (False), pad (1).
    """

    def __init__(self, fine_prob, coarse_prob, params: dict):
        params = dict(params)
        self.iorder = params.get('iorder', 2)
        self.rorder = params.get('rorder', 2)
        self.periodic = params.get('periodic', getattr(fine_prob, 'bc', '') == 'periodic')
        if self.rorder % 2 != 0:
            raise TransferError('Need even order for restriction')
        if self.iorder % 2 != 0:
            raise TransferError('Need even order for interpolation')

        f_shape, c_shape = fine_prob.shape, coarse_prob.shape
        if len(f_shape) != len(c_shape):
            raise TransferError('fine and coarse problems need the same number of dimensions')
        self.fine_shape, self.coarse_shape = f_shape, c_shape

        self.P_1d, self.R_1d = [], []
        for nf, nc in zip(f_shape, c_shape):
            if nf == nc:
                self.P_1d.append(np.eye(nf))
                self.R_1d.append(np.eye(nf))
                continue
            if self.periodic:
                fine_grid = np.arange(nf) / nf
                coarse_grid = np.arange(nc) / nc
            else:
                fine_grid = np.arange(1, nf + 1) / (nf + 1)
                coarse_grid = np.arange(1, nc + 1) / (nc + 1)
            P = interpolation_matrix_1d(fine_grid, coarse_grid, k=self.iorder, periodic=self.periodic)
            if self.iorder == self.rorder:
                R = 0.5 * P.T
            else:
                R = 0.5 * interpolation_matrix_1d(
                    fine_grid, coarse_grid, k=self.rorder, periodic=self.periodic
                ).T
            self.P_1d.append(P)
            self.R_1d.append(R)

    @staticmethod
    def _apply_per_axis(mats, x, ndim_space):
        from pysdc_tpu.core.precision import COEFF_PRECISION

        offset = x.ndim - ndim_space
        for axis, M in enumerate(mats):
            ax = axis + offset
            x = jnp.moveaxis(
                jnp.tensordot(jnp.asarray(M, x.dtype), x, axes=(1, ax), precision=COEFF_PRECISION), 0, ax
            )
        return x

    def restrict(self, F):
        """Fine -> coarse on arrays or pytrees with trailing space dims."""
        nd = len(self.fine_shape)
        return jax.tree_util.tree_map(lambda leaf: self._apply_per_axis(self.R_1d, leaf, nd), F)

    def prolong(self, G):
        nd = len(self.coarse_shape)
        return jax.tree_util.tree_map(lambda leaf: self._apply_per_axis(self.P_1d, leaf, nd), G)
