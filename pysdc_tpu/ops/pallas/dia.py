"""Pallas TPU kernel: diagonal-format (DIA) SpMV for assembled FD matrices.

The DIA container (``pysdc_tpu.ops.sparse.DIA``) stores a stencil matrix as
k diagonals — ``y[i] = sum_j d_j[i] * u[i + o_j]`` with static offsets
``o_j`` (the SpMV role of the reference's CSR eval_f,
``generic_ND_FD.py:208-240``).  The jnp fallback expresses the shifted reads
as ``jnp.roll``; XLA materializes one rotated copy of ``u`` per diagonal.
This kernel instead streams ``u`` tile by tile and applies ALL diagonals
from VMEM in one pass:

- ``u`` is viewed as a (rows, 128) lane grid, processed in (Tr, 128) tiles.
- a shift by ``o_j`` decomposes into a whole-tile part ``q_j = o_j // T``
  (T = Tr*128 elements) and an intra-tile part ``s_j = o_j mod T``.  The
  whole-tile part is handled by the *pipeline* — per diagonal the kernel
  receives the two consecutive u-tiles ``(i+q_j) % nb`` and
  ``(i+q_j+1) % nb`` via scalar-prefetched block index maps — and the
  intra-tile part by one lane rotation + row-shifted select, all static.
- wrap-around block indices are taken mod nb over the zero-PADDED array;
  this is exact because a stored entry ``A[i, i+o]`` implies
  ``0 <= i+o < n`` — positions whose padded/mod read would be wrong carry
  zero coefficients by construction (see DIA's docstring).

The output tile stays resident in VMEM while the k diagonals accumulate
(grid = (tiles, k), accumulation on the revisited block like the BSR
kernel in ``spmv.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _dia_kernel(shifts, Tr, q_ref, d_ref, ua_ref, ub_ref, y_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    d = d_ref[0]
    for jj, s in enumerate(shifts):
        r0, l0 = s // LANES, s % LANES

        @pl.when(j == jj)
        def _(r0=r0, l0=l0):
            if l0 == 0:
                if r0 == 0:
                    win = ua_ref[:]
                else:
                    full = jnp.concatenate([ua_ref[:], ub_ref[:]], axis=0)
                    win = full[r0 : r0 + Tr]
            else:
                full = jnp.concatenate([ua_ref[:], ub_ref[:]], axis=0)
                # flat shift by s = r0 rows + l0 lanes WITH row carry: rotate
                # lanes, then pick row r0 for the lanes that stayed in-row
                # and row r0+1 for the lanes that wrapped
                rolled = pltpu.roll(full, LANES - l0, axis=1)
                lo = rolled[r0 : r0 + Tr]
                hi = rolled[r0 + 1 : r0 + Tr + 1]
                mask = jax.lax.broadcasted_iota(jnp.int32, (Tr, LANES), 1) < (LANES - l0)
                win = jnp.where(mask, lo, hi)
            y_ref[:] += d * win


class _DiaPlan:
    """Static plan (grid, index maps, compiled call) for one DIA *structure*.

    Holds only trace-independent state (shapes, offsets, the pallas_call);
    the diagonal data enters through :meth:`apply` so the plan can be cached
    on the (pytree) DIA object without leaking tracers across jit traces.
    """

    def __init__(self, n, offsets, dtype, Tr=32, interpret=False):
        k = len(offsets)
        T = Tr * LANES
        nb = max(-(-n // T), 2)  # >= 2 blocks so the +1 neighbor tile exists
        n_pad = nb * T
        self.key = (n, tuple(offsets), np.dtype(dtype).str, Tr, bool(interpret))
        self.n, self.T, self.Tr, self.nb, self.k = n, T, Tr, nb, k
        self.n_pad = n_pad

        q = [o // T for o in offsets]
        self.shifts = tuple(o - qj * T for o, qj in zip(offsets, q))
        self.q = np.asarray(q, np.int32)

        kernel = functools.partial(_dia_kernel, self.shifts, Tr)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, k),
            in_specs=[
                pl.BlockSpec((1, Tr, LANES), lambda i, j, q: (j, i, 0)),
                pl.BlockSpec((Tr, LANES), lambda i, j, q: ((i + q[j]) % nb, 0)),
                pl.BlockSpec((Tr, LANES), lambda i, j, q: ((i + q[j] + 1) % nb, 0)),
            ],
            out_specs=pl.BlockSpec((Tr, LANES), lambda i, j, q: (i, 0)),
        )
        self._call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), np.dtype(dtype)),
            interpret=bool(interpret),
        )

    def apply(self, data, u):
        n, n_pad, k = self.n, self.n_pad, self.k
        d_pad = jnp.zeros((k, n_pad), data.dtype).at[:, :n].set(data)
        u_pad = jnp.zeros((n_pad,), u.dtype).at[:n].set(u)
        u2 = u_pad.reshape(-1, LANES)
        y = self._call(jnp.asarray(self.q), d_pad.reshape(k, -1, LANES), u2, u2)
        return y.reshape(-1)[:n]


def dia_spmv(dia, u, Tr=64, interpret=False, version=2):
    """y = A @ u for a DIA matrix via the tiled Pallas kernel.

    ``u``: (..., n) — leading axes batch via vmap.  The structural plan
    (grid/index maps/compiled call) is cached on the DIA object; the
    diagonal data flows through the trace, so the cache survives jit.
    """
    cls = _DiaPlanV2 if version == 2 else _DiaPlan
    key = (dia.shape[0], tuple(dia.offsets), np.dtype(dia.data.dtype).str, Tr, bool(interpret))
    if version == 2:
        key = key + ('v2',)
    plan = getattr(dia, '_pallas_plan', None)
    if plan is None or plan.key != key:
        plan = cls(dia.shape[0], dia.offsets, dia.data.dtype, Tr=Tr, interpret=interpret)
        dia._pallas_plan = plan
    fn = functools.partial(plan.apply, dia.data)
    for _ in range(u.ndim - 1):
        fn = jax.vmap(fn)
    return fn(u)


# -- v2: single-dim grid, all diagonals per step from a shared window -------

def _dia_kernel_v2(plan_items, Tr, d_ref, *refs):
    """One grid step produces one output tile from k diagonals.

    ``refs`` = window/wrap input refs + the output ref (last).  Compact
    diagonals (|o| < T) read from the 3-consecutive-tile window (fetched
    once per step — u traffic 3 passes instead of 2k); each wrap diagonal
    brings its own 2-tile pair.  Lane rotations are cached per distinct
    intra-tile shift.
    """
    y_ref = refs[-1]
    acc = jnp.zeros_like(y_ref)
    rolled_cache = {}
    for jj, (kind, base, s) in enumerate(plan_items):
        r0, l0 = s // LANES, s % LANES
        if kind == 'window':
            full = jnp.concatenate([refs[0][:], refs[1][:], refs[2][:]], axis=0)
        else:  # dedicated pair for a wrap diagonal
            full = jnp.concatenate([refs[base][:], refs[base + 1][:]], axis=0)
        key = (kind, base, l0)
        if l0 == 0:
            win = full[r0 : r0 + Tr]
        else:
            if key not in rolled_cache:
                rolled_cache[key] = pltpu.roll(full, LANES - l0, axis=1)
            rolled = rolled_cache[key]
            lo = rolled[r0 : r0 + Tr]
            hi = rolled[r0 + 1 : r0 + Tr + 1]
            mask = jax.lax.broadcasted_iota(jnp.int32, (Tr, LANES), 1) < (LANES - l0)
            win = jnp.where(mask, lo, hi)
        acc += d_ref[jj] * win
    y_ref[:] = acc


class _DiaPlanV2:
    """Single-dim-grid plan: per output tile, fetch the (i-1, i, i+1) window
    once and apply every compact diagonal from it; wrap diagonals get their
    own two tiles.  All block index maps are static (no scalar prefetch)."""

    def __init__(self, n, offsets, dtype, Tr=64, interpret=False):
        k = len(offsets)
        T = Tr * LANES
        nb = max(-(-n // T), 3)  # window needs i-1, i, i+1 distinct-capable
        n_pad = nb * T
        self.key = (n, tuple(offsets), np.dtype(dtype).str, Tr, bool(interpret), 'v2')
        self.n, self.T, self.Tr, self.nb, self.k = n, T, Tr, nb, k
        self.n_pad = n_pad

        # classify diagonals; windows cover elements [(i-1)T, (i+2)T)
        plan_items = []
        u_specs = [
            pl.BlockSpec((Tr, LANES), (lambda i, d=d: ((i + d) % nb, 0)))
            for d in (-1, 0, 1)
        ]
        nrefs = 3
        for o in offsets:
            if -T <= o < T:
                plan_items.append(('window', 0, o + T))  # shift rel. window start
            else:
                q = o // T
                s = o - q * T
                u_specs.append(pl.BlockSpec((Tr, LANES), (lambda i, q=q: ((i + q) % nb, 0))))
                u_specs.append(pl.BlockSpec((Tr, LANES), (lambda i, q=q: ((i + q + 1) % nb, 0))))
                plan_items.append(('pair', nrefs, s))
                nrefs += 2

        kernel = functools.partial(_dia_kernel_v2, tuple(plan_items), Tr)
        self._call = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((k, Tr, LANES), lambda i: (0, i, 0))] + u_specs,
            out_specs=pl.BlockSpec((Tr, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), np.dtype(dtype)),
            interpret=bool(interpret),
        )
        self._n_u = nrefs

    def apply(self, data, u):
        n, n_pad, k = self.n, self.n_pad, self.k
        d_pad = jnp.zeros((k, n_pad), data.dtype).at[:, :n].set(data)
        u_pad = jnp.zeros((n_pad,), u.dtype).at[:n].set(u)
        u2 = u_pad.reshape(-1, LANES)
        y = self._call(d_pad.reshape(k, -1, LANES), *([u2] * self._n_u))
        return y.reshape(-1)[:n]
