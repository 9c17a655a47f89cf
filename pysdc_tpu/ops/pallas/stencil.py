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
try:
    from jax import shard_map
except ImportError:  # older jax
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


def stencil2d_periodic(u, c0: float, cx: float, cy: float, interpret: bool | None = None):
    """Fused periodic 5-point stencil via Pallas.  Equivalent to
    ``c0*u + cx*(roll(u,1,0)+roll(u,-1,0)) + cy*(roll(u,1,1)+roll(u,-1,1))``.
    Thin wrapper over :func:`cross_stencil_2d`."""
    terms = ((float(cx), float(c0), float(cx)), (-1, 0, 1)), ((float(cy), float(cy)), (-1, 1))
    return cross_stencil_2d(u, terms, interpret=interpret)


def _align_up(n: int, align: int) -> int:
    return -(-n // align) * align


def cross_stencil_aligned(nx: int, ny: int) -> bool:
    """True when the (nx, ny) grid admits Mosaic-aligned Pallas tiles.

    The kernels DMA HBM windows whose row starts must be 8-aligned and whose
    trailing dimension must tile by 128 — Mosaic rejects ("Failed to prove
    that a tile index ... is divisible by the tiling") anything else on real
    hardware, even though interpret mode accepts it.  Unaligned grids (any
    coarse MLSDC level <= 64 wide, odd sizes) take the jnp.roll path instead.
    """
    return nx % 8 == 0 and ny % 128 == 0


def _roll_cross_2d(u, terms):
    """Reference roll path: same math as the Pallas kernels, any shape."""
    (coeff_x, offs_x), (coeff_y, offs_y) = terms
    acc = jnp.zeros_like(u)
    for c, s in zip(coeff_x, offs_x):
        acc = acc + float(c) * jnp.roll(u, -int(s), axis=-2)
    for c, s in zip(coeff_y, offs_y):
        acc = acc + float(c) * jnp.roll(u, -int(s), axis=-1)
    return acc


def _cross2d_kernel(up_ref, out_ref, tile_vmem, sem, *, terms, rx, ry, tx, ty, wx, wy):
    """Grid step (b, i, j): DMA the aligned (wx, wy) window of batch slice b
    (tile + halo, rounded up to the (8, 128) tiling Mosaic requires of HBM
    slices) into VMEM, evaluate the cross-shaped stencil (arbitrary static
    offsets per axis) on the VPU, write the (tx, ty) tile."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma = pltpu.make_async_copy(
        up_ref.at[b, pl.ds(i * tx, wx), pl.ds(j * ty, wy)],
        tile_vmem,
        sem,
    )
    dma.start()
    dma.wait()
    u = tile_vmem[:]
    (coeff_x, offs_x), (coeff_y, offs_y) = terms
    acc = jnp.zeros((tx, ty), u.dtype)
    for c, s in zip(coeff_x, offs_x):
        acc = acc + c * u[rx + s : rx + s + tx, ry : ry + ty]
    for c, s in zip(coeff_y, offs_y):
        acc = acc + c * u[rx : rx + tx, ry + s : ry + s + ty]
    out_ref[0] = acc


@functools.lru_cache(maxsize=None)
def _cross_stencil_fn(terms, interpret):
    """Build the (vmap-capable) stencil function for one static tap table.

    ``pallas_call`` cannot be vmapped with an ANY-memory-space operand, but
    the kernel already supports arbitrary leading batch axes — so the vmap
    rule simply feeds the batch axis through as one more leading axis."""

    @jax.custom_batching.custom_vmap
    def f(u):
        return _cross_stencil_impl(u, terms, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, u):  # noqa: ARG001
        return f(u), in_batched[0]

    return jax.jit(f)


def cross_stencil_2d(u, terms, interpret: bool | None = None):
    """Arbitrary-offset periodic cross stencil on the trailing two axes.

    ``terms = ((coeff_x, offs_x), (coeff_y, offs_y))`` — nested tuples of
    Python floats/ints (static).  Equivalent to
    ``sum_d sum_s c_{d,s} * roll(u, -s, axis=d)`` but fused into one Pallas
    pass over HBM: the ghost-padded operand stays in HBM, each grid block
    DMAs its tile + halo into VMEM and evaluates all taps there.  Windows
    are rounded up to the (8, 128) memref tiling (Mosaic rejects unaligned
    HBM slices); the operand is wrap-padded far enough that the rounded
    window always reads valid periodic data.  Leading axes batch
    (collocation nodes / PFASST steps).

    This is the hot ``SeparableFDOperator.apply`` path on TPU for 2D
    periodic operators of any order (reference assembles a scipy CSR matrix
    instead, generic_ND_FD.py:120-180).

    Grids without Mosaic-aligned tilings (see :func:`cross_stencil_aligned`)
    dispatch to the numerically identical roll path — in interpret mode too,
    so the CPU suite exercises exactly the dispatch real hardware takes.
    """
    if not cross_stencil_aligned(*u.shape[-2:]):
        return _roll_cross_2d(u, terms)
    if interpret is None:
        interpret = not _on_tpu()
    return _cross_stencil_fn(terms, interpret)(u)


def _shift_cols(u, s):
    """u[:, j+s] with periodic wrap, via static slices (VMEM-resident)."""
    if s == 0:
        return u
    return jnp.concatenate([u[:, s:], u[:, :s]], axis=1)


def _cross2d_rows_db_kernel(u_ref, out_ref, tile2, sems, *, terms, tx, nx, H, ni, ng):
    """Pad-free, double-buffered grid step (b, i): three DMAs pull the
    (tx, ny) row band plus H-row periodic halos straight from the UNPADDED
    operand (the wrap is modular arithmetic on the row start — tile
    boundaries coincide with the array boundary, so a halo block never
    straddles the wrap; all row starts are (8-row block index) * 8 so Mosaic
    can prove divisibility by the (8, 128) memref tiling).  All taps
    evaluate in VMEM: x taps are static row slices of the extended band,
    y taps periodic column shifts of the center rows.  While the VPU
    evaluates grid step g from buffer g%2, the DMA engine already pulls
    step g+1's band into buffer (g+1)%2 — input latency hides under
    compute, leaving the HBM streams as the only cost."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nblk, tblk = nx // H, tx // H
    g = b * ni + i

    def copies(bb, ii, slot):
        row0 = ii * tblk * H
        top = ((ii * tblk - 1) % nblk) * H
        bot = (((ii + 1) * tblk) % nblk) * H
        dst = tile2.at[slot]
        return (
            pltpu.make_async_copy(u_ref.at[bb, pl.ds(top, H), :], dst.at[pl.ds(0, H), :], sems.at[slot, 0]),
            pltpu.make_async_copy(u_ref.at[bb, pl.ds(row0, tx), :], dst.at[pl.ds(H, tx), :], sems.at[slot, 1]),
            pltpu.make_async_copy(u_ref.at[bb, pl.ds(bot, H), :], dst.at[pl.ds(H + tx, H), :], sems.at[slot, 2]),
        )

    @pl.when(g == 0)
    def _():
        for c in copies(b, i, 0):
            c.start()

    @pl.when(g + 1 < ng)
    def _():
        g1 = g + 1
        for c in copies(g1 // ni, g1 % ni, (g + 1) % 2):
            c.start()

    for c in copies(b, i, g % 2):
        c.wait()
    u = tile2[g % 2]
    (coeff_x, offs_x), (coeff_y, offs_y) = terms
    center = u[H : H + tx, :]
    acc = jnp.zeros_like(center)
    for c, s in zip(coeff_x, offs_x):
        acc = acc + c * u[H + s : H + s + tx, :]
    for c, s in zip(coeff_y, offs_y):
        acc = acc + c * _shift_cols(center, int(s))
    out_ref[0] = acc


def _cross_stencil_rows(ub, terms, rx, interpret, vmem_budget=4 << 20):
    """Fast path: full-width row bands, periodic x handled by halo DMAs.

    ``vmem_budget`` bounds ONE scratch band; two live (double buffering),
    the out block is double-buffered by Mosaic, and tap evaluation needs ~2
    tile-sized temporaries — the total stays under the 16 MB scoped-VMEM
    limit."""
    nb, nx, ny = ub.shape
    H = 8  # aligned halo block (covers stencil radii up to 8)
    itemsize = jnp.dtype(ub.dtype).itemsize
    tx = _pick_tile(nx, max((vmem_budget // (ny * itemsize)) - 2 * H, 8), 8)
    if (2 * H + tx) * ny * itemsize > 2 * vmem_budget:
        return None  # rows too wide for VMEM — caller falls back
    ni = nx // tx
    kernel = functools.partial(
        _cross2d_rows_db_kernel, terms=terms, tx=tx, nx=nx, H=H, ni=ni, ng=nb * ni
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nx, ny), ub.dtype),
        grid=(nb, ni),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tx, ny), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * H + tx, ny), ub.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(ub)


def _cross_stencil_impl(u, terms, interpret):
    nx, ny = u.shape[-2:]
    batch_shape = u.shape[:-2]
    ub = u.reshape((-1, nx, ny))
    nb = ub.shape[0]

    (coeff_x, offs_x), (coeff_y, offs_y) = terms
    rx = max(abs(int(s)) for s in offs_x) if offs_x else 0
    ry = max(abs(int(s)) for s in offs_y) if offs_y else 0

    if rx <= 8 and nx % 8 == 0 and ny % 128 == 0:
        out = _cross_stencil_rows(ub, terms, rx, interpret)
        if out is not None:
            return out.reshape(batch_shape + (nx, ny))

    tx = _pick_tile(nx, 256, 8)
    ty = _pick_tile(ny, 512, 128)
    # aligned DMA window (tile + halo rounded up); extra wrap padding keeps
    # the widest window in bounds — the surplus cells are fetched, not used
    wx = _align_up(tx + 2 * rx, 8)
    wy = _align_up(ty + 2 * ry, 128)
    up = jnp.pad(ub, ((0, 0), (rx, wx - tx - rx), (ry, wy - ty - ry)), mode='wrap')
    grid = (nb, nx // tx, ny // ty)

    kernel = functools.partial(
        _cross2d_kernel, terms=terms, rx=rx, ry=ry, tx=tx, ty=ty, wx=wx, wy=wy
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, nx, ny), u.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tx, ty), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((wx, wy), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(up)
    return out.reshape(batch_shape + (nx, ny))


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
    return shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)(u)


def halo_cross_apply(u, mesh, terms, axis: str = 'space'):
    """Arbitrary-width periodic cross stencil on an array whose leading
    spatial axis is sharded over mesh axis ``axis``.

    ``terms = ((coeff_x, offs_x), (coeff_y, offs_y))`` as in
    :func:`cross_stencil_2d`.  An ``rx``-deep halo travels over ICI via
    ``ppermute`` (one send each way, regardless of stencil order); the local
    taps are plain fused slices.  Numerically identical to the unsharded
    apply (gated in tests/test_pallas_stencil.py)."""
    (coeff_x, offs_x), (coeff_y, offs_y) = terms
    rx = max((abs(int(s)) for s in offs_x), default=0)
    ry = max((abs(int(s)) for s in offs_y), default=0)
    n_shards = mesh.shape[axis]
    perm_fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    perm_bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def shard_fn(u_loc):
        nloc = u_loc.shape[0]
        if rx > nloc:
            raise ValueError(f'stencil radius {rx} exceeds local shard size {nloc}')
        if rx > 0:
            top_ghost = jax.lax.ppermute(u_loc[-rx:], axis, perm_fwd)
            bot_ghost = jax.lax.ppermute(u_loc[:rx], axis, perm_bwd)
            ext = jnp.concatenate([top_ghost, u_loc, bot_ghost], axis=0)
        else:
            ext = u_loc
        up = jnp.pad(ext, ((0, 0), (ry, ry)), mode='wrap')
        acc = jnp.zeros_like(u_loc)
        for c, s in zip(coeff_x, offs_x):
            acc = acc + c * up[rx + s : rx + s + nloc, ry : ry + up.shape[1] - 2 * ry]
        for c, s in zip(coeff_y, offs_y):
            acc = acc + c * up[rx : rx + nloc, ry + s : ry + s + up.shape[1] - 2 * ry]
        return acc

    spec = PartitionSpec(axis, None)
    return shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)(u)


def halo_cross_apply_batched(u, mesh, terms, axis: str = 'space'):
    """Arbitrary-width periodic cross stencil with leading batch axes, the
    first spatial axis sharded over mesh axis ``axis``.

    The production space-decomposed apply (SURVEY P7): ONE rx-deep halo
    ppermute each way per apply regardless of stencil order — versus the
    roll path's one boundary exchange per tap under GSPMD — and the
    ghost-independent y-direction taps are computed while the halos are in
    flight (the sends are issued first, the y accumulation has no data
    dependence on them, so XLA's latency-hiding scheduler overlaps the
    collective-permute with that compute).

    ``u``: (..., nx, ny); batch axes must not be sharded (use on space-only
    meshes — a sharded batch axis would be all-gathered by the vmap-of-
    shard_map composition).  Numerically identical to the roll path (gated
    in tests/test_pallas_stencil.py).
    """
    (coeff_x, offs_x), (coeff_y, offs_y) = terms
    rx = max((abs(int(s)) for s in offs_x), default=0)
    n_shards = mesh.shape[axis]
    perm_fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    perm_bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def shard_fn(u_loc):
        nloc = u_loc.shape[-2]
        if rx > nloc:
            raise ValueError(f'stencil radius {rx} exceeds local shard size {nloc}')
        # 1) issue the halo sends (async collective-permute over ICI)
        if rx > 0:
            top_ghost = jax.lax.ppermute(u_loc[..., -rx:, :], axis, perm_fwd)
            bot_ghost = jax.lax.ppermute(u_loc[..., :rx, :], axis, perm_bwd)
        # 2) ghost-independent work overlaps with the halos in flight:
        # y taps plus the in-range part of every x tap (zero-filled
        # shifts fuse into one elementwise chain — no extended-array copy)
        nb = u_loc.ndim - 2
        acc = jnp.zeros_like(u_loc)
        for c, s in zip(coeff_y, offs_y):
            acc = acc + float(c) * jnp.roll(u_loc, -int(s), axis=-1)
        pad_cfg = [(0, 0)] * nb
        for c, s in zip(coeff_x, offs_x):
            s = int(s)
            if s == 0:
                acc = acc + float(c) * u_loc
            elif s > 0:
                shifted = jnp.pad(u_loc[..., s:, :], pad_cfg + [(0, s), (0, 0)])
                acc = acc + float(c) * shifted
            else:
                shifted = jnp.pad(u_loc[..., :s, :], pad_cfg + [(-s, 0), (0, 0)])
                acc = acc + float(c) * shifted
        # 3) edge-row corrections from the arrived ghosts (tiny updates)
        if rx > 0:
            top_corr = jnp.zeros_like(acc[..., :rx, :])
            bot_corr = jnp.zeros_like(acc[..., :rx, :])
            for c, s in zip(coeff_x, offs_x):
                s = int(s)
                if s < 0:  # rows i < -s read ghost rows above: top_ghost[rx+s+i]
                    top_corr = top_corr.at[..., : -s, :].add(
                        float(c) * top_ghost[..., rx + s :, :]
                    )
                elif s > 0:  # rows i >= nloc-s read ghost rows below
                    bot_corr = bot_corr.at[..., rx - s :, :].add(
                        float(c) * bot_ghost[..., : s, :]
                    )
            acc = acc.at[..., :rx, :].add(top_corr)
            acc = acc.at[..., nloc - rx :, :].add(bot_corr)
        return acc

    nb = u.ndim - 2
    spec = PartitionSpec(*([None] * nb), axis, None)
    return shard_map(shard_fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False)(u)
