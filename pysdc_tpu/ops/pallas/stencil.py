"""Pallas TPU kernels for the FD stencil hot path + sharded halo exchange.

The spatial-parallel analog of the reference's pencil decompositions / PETSc
DMDA halos (SURVEY P6/P7; reference helpers/spectral_helper.py:1643-1903,
problem_classes/*PETSc*): the space axis of the device mesh shards the
leading spatial dimension, a 1-deep halo travels over ICI via
``jax.lax.ppermute`` inside ``shard_map``, and the local stencil is a fused
Pallas VPU kernel (grid-tiled, VMEM-resident, one pass over HBM).

Two entry points:

- :func:`stencil2d_periodic` — single-chip fused 5-point stencil
  ``out = c0*u + cx*(roll(+x)+roll(-x)) + cy*(roll(+y)+roll(-y))`` as one
  Pallas kernel (falls back to interpret mode off-TPU so tests run on the
  virtual CPU mesh).
- :func:`halo_stencil_apply` — the same operator on an array whose leading
  spatial axis is sharded over a mesh axis: ppermute halo exchange + local
  stencil, numerically identical to the unsharded apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


def _pick_tile(n: int, target: int, align: int) -> int:
    """Largest multiple of ``align`` <= target dividing n, else n itself."""
    best = n
    t = (target // align) * align
    while t >= align:
        if n % t == 0:
            return t
        t -= align
    return best


def _stencil2d_kernel(up_ref, out_ref, tile_vmem, sem, *, c0, cx, cy, tx, ty):
    """Grid step (i, j): DMA the (tx+2, ty+2) tile+halo window from the
    ghost-padded operand in HBM into VMEM, apply the fused 5-point stencil
    on the VPU, write the (tx, ty) output block."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        up_ref.at[pl.ds(i * tx, tx + 2), pl.ds(j * ty, ty + 2)],
        tile_vmem,
        sem,
    )
    dma.start()
    dma.wait()
    u = tile_vmem[:]
    out_ref[:] = (
        c0 * u[1:-1, 1:-1]
        + cx * (u[2:, 1:-1] + u[:-2, 1:-1])
        + cy * (u[1:-1, 2:] + u[1:-1, :-2])
    )


@functools.partial(jax.jit, static_argnames=('c0', 'cx', 'cy', 'interpret'))
def stencil2d_periodic(u, c0: float, cx: float, cy: float, interpret: bool | None = None):
    """Fused periodic 5-point stencil via Pallas.

    The ghost-padded operand stays in HBM (``memory_space=ANY``); each grid
    block DMAs its tile plus a 1-deep halo into a VMEM scratch buffer
    (overlapping windows cannot be expressed as BlockSpecs), computes on the
    VPU, and writes the tile.  Equivalent to
    ``c0*u + cx*(roll(u,1,0)+roll(u,-1,0)) + cy*(roll(u,1,1)+roll(u,-1,1))``.
    """
    if interpret is None:
        interpret = not _on_tpu()
    nx, ny = u.shape
    up = jnp.pad(u, 1, mode='wrap')

    tx = _pick_tile(nx, 256, 8)
    ty = _pick_tile(ny, 512, 128)
    grid = (nx // tx, ny // ty)

    kernel = functools.partial(_stencil2d_kernel, c0=c0, cx=cx, cy=cy, tx=tx, ty=ty)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny), u.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tx, ty), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tx + 2, ty + 2), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(up)


def _local_stencil_with_halo(u_loc, left_ghost, right_ghost, c0, cx, cy):
    """Local 5-point stencil given 1-deep ghosts on the (sharded) first axis;
    second axis stays periodic locally."""
    ext = jnp.concatenate([left_ghost[None], u_loc, right_ghost[None]], axis=0)
    up = jnp.pad(ext, ((0, 0), (1, 1)), mode='wrap')
    return (
        c0 * up[1:-1, 1:-1]
        + cx * (up[2:, 1:-1] + up[:-2, 1:-1])
        + cy * (up[1:-1, 2:] + up[1:-1, :-2])
    )


def halo_stencil_apply(u, mesh, c0: float, cx: float, cy: float, axis: str = 'space'):
    """Periodic 5-point stencil on an array sharded over ``axis`` (leading
    spatial dimension): ppermute halo exchange (ICI) + local fused stencil.

    Matches the unsharded ``stencil2d_periodic`` bitwise in float64 on the
    virtual mesh (gated in tests/test_pallas_stencil.py).
    """
    n_shards = mesh.shape[axis]
    perm_fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    perm_bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def shard_fn(u_loc):
        # my last row -> right neighbor's left ghost; first row -> left ghost
        left_ghost = jax.lax.ppermute(u_loc[-1], axis, perm_fwd)
        right_ghost = jax.lax.ppermute(u_loc[0], axis, perm_bwd)
        return _local_stencil_with_halo(u_loc, left_ghost, right_ghost, c0, cx, cy)

    spec = PartitionSpec(axis, None)
    return shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec)(u)
