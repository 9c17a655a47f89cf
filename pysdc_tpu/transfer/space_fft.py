"""Spectral (FFT pad/truncate) space transfer for periodic grids.

Counterpart of the reference ``TransferMesh_FFT`` / ``TransferMesh_MPIFFT``
(implementations/transfer_classes): restriction truncates the Fourier
spectrum to the coarse modes, prolongation zero-pads it — spectrally exact
for resolved fields, and a pure bandwidth operation on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.errors import TransferError


class FFTTransfer:
    """Works on problems whose trailing ``ndim_space`` axes are periodic
    grids (shape attributes define the sizes; leading component axes pass
    through untouched)."""

    def __init__(self, fine_prob, coarse_prob, params: dict):
        f_shape, c_shape = fine_prob.shape, coarse_prob.shape
        if len(f_shape) != len(c_shape):
            raise TransferError('fine and coarse problems need the same rank')
        # trailing axes that actually change are the spectral grid
        self.ndim_space = sum(1 for f, c in zip(f_shape, c_shape) if f != c) or len(f_shape)
        self.fine_shape = f_shape[-self.ndim_space:]
        self.coarse_shape = c_shape[-self.ndim_space:]
        for nf, nc in zip(self.fine_shape, self.coarse_shape):
            if nf % 2 or nc % 2:
                raise TransferError('FFT transfer needs even grid sizes')
        self.ratio = float(np.prod(self.fine_shape) / np.prod(self.coarse_shape))

    def _axes(self, x):
        return tuple(range(x.ndim - self.ndim_space, x.ndim))

    def _resample(self, x, target_shape):
        axes = self._axes(x)
        x_hat = jnp.fft.fftn(x.astype(complex), axes=axes, norm='forward')
        for ax, n_to in zip(axes, target_shape):
            n_from = x_hat.shape[ax]
            x_hat = jnp.fft.fftshift(x_hat, axes=ax)
            if n_to < n_from:
                # window [-n_to/2, n_to/2); fold the +n_to/2 mode into the
                # -n_to/2 slot so the coarse Nyquist keeps both halves
                lo = (n_from - n_to) // 2
                fold = jnp.take(x_hat, jnp.array([lo + n_to]), axis=ax)
                sl = [slice(None)] * x_hat.ndim
                sl[ax] = slice(lo, lo + n_to)
                x_hat = x_hat[tuple(sl)]
                first = jnp.take(x_hat, jnp.array([0]), axis=ax) + fold
                rest_sl = [slice(None)] * x_hat.ndim
                rest_sl[ax] = slice(1, None)
                x_hat = jnp.concatenate([first, x_hat[tuple(rest_sl)]], axis=ax)
            elif n_to > n_from:
                # split the coarse Nyquist (-n_from/2) evenly onto +-n_from/2
                # to keep the padded spectrum Hermitian (real ifft)
                half = 0.5 * jnp.take(x_hat, jnp.array([0]), axis=ax)
                rest_sl = [slice(None)] * x_hat.ndim
                rest_sl[ax] = slice(1, None)
                x_hat = jnp.concatenate([half, x_hat[tuple(rest_sl)], half], axis=ax)
                pads = [(0, 0)] * x_hat.ndim
                lo = (n_to - n_from) // 2
                pads[ax] = (lo, n_to - n_from - lo - 1)
                x_hat = jnp.pad(x_hat, pads)
            x_hat = jnp.fft.ifftshift(x_hat, axes=ax)
        out = jnp.fft.ifftn(x_hat, axes=self._axes(x_hat), norm='forward')
        return jnp.real(out) if not jnp.iscomplexobj(x) else out

    def restrict(self, F):
        return jax.tree_util.tree_map(
            lambda leaf: self._resample(leaf, self.coarse_shape).astype(leaf.dtype), F
        )

    def prolong(self, G):
        return jax.tree_util.tree_map(
            lambda leaf: self._resample(leaf, self.fine_shape).astype(leaf.dtype), G
        )
