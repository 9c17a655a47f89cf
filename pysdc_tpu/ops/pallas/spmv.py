"""Pallas TPU kernel: block-sparse (BSR) matrix times dense block of vectors.

The north-star SpMV/SpMM kernel: the matrix is stored as block rows of dense
``(br, bc)`` blocks whose column segments are *contiguous* (built by
:class:`pysdc_tpu.ops.sparse.BSR`), so the kernel never gathers — it reads
``u`` with dynamic slices (seg starts are scalar-prefetched into SMEM) and
runs each block product on the MXU, accumulating in the output block that
stays resident in VMEM across the inner grid dimension.

Batched over the trailing axis, a single call applies the operator to all
collocation nodes at once (the SpMM the north star names: "collocation
Q-matrix applied across nodes as a batched dense-times-sparse").

Layout: ``u (N_cols, B)``, ``y (N_rows, B)`` with B the batch (node) axis on
lanes; row blocks on sublanes.  ``bc`` should be a multiple of 8 so dynamic
sublane slices stay aligned; B is padded to lanes by the tiling layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bsr_kernel(seg_ref, blocks_ref, u_ref, y_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    i = pl.program_id(0)
    kb = pl.num_programs(1)
    block = blocks_ref[0, 0]                       # (br, bc)
    # seg_ref is FLAT (nb*kb,) — 2D scalar arrays get lane-padded to 128 in
    # SMEM and blow its 1 MB budget — and holds starts in BLOCK-COLUMN
    # units; multiplying by bc here lets Mosaic prove the dynamic sublane
    # slice is bc-aligned
    start = seg_ref[i * kb + j] * block.shape[1]
    useg = u_ref[pl.ds(start, block.shape[1]), :]  # (bc, B)
    y_ref[:] += jnp.dot(block, useg, preferred_element_type=y_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def bsr_spmm(bsr, u, interpret: bool = False):
    """y = A @ u for a :class:`~pysdc_tpu.ops.sparse.BSR` matrix.

    ``u`` has shape (N, B) — operator axis first, batch columns last; returns
    (N_rows, B).  Pass B=1 for a plain SpMV.
    """
    nb, kb, br, bc = bsr.blocks.shape
    n_rows = bsr.shape[0]
    B = u.shape[1]
    dtype = jnp.result_type(bsr.blocks.dtype, u.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, kb),
        in_specs=[
            pl.BlockSpec((1, 1, br, bc), lambda i, j, segs: (i, j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, B), lambda i, j, segs: (i, 0)),
    )
    y = pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, B), dtype),
        interpret=interpret,
    )((bsr.seg_starts // bsr.bc).reshape(-1), bsr.blocks.astype(dtype), u.astype(dtype))
    return y


# Block-size guidance (measured on hardware, 256x256 var-coeff diffusion,
# B=4 node batch): br=8 is grid-step-bound (~32k Pallas steps of tiny 8x8
# dots -> ~0.1 Gnnz/s); br=256 runs 768 steps of MXU-sized (256,256)x(256,B)
# products and streams the dense blocks at HBM rate -> ~23 Gnnz/s per-call.
# The lane padding of a small node batch (B=4 -> 128) is irrelevant because
# the kernel is bound by block traffic, not MXU FLOPs.  A batch-major
# variant (batch on sublanes, block columns on lanes) was measured and
# rejected: its required (N, B) -> (B, N) input transpose costs more than
# the whole SpMM.
