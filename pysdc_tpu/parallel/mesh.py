"""Device-mesh helpers for the (time, node, space) sharding of PFASST blocks.

The reference scales with nested MPI communicators
``[comm_time, comm_node, comm_space]`` (projects/GPU/configs/base_config.py:20-57);
the TPU-native equivalent is a single 3-axis ``jax.sharding.Mesh`` whose axes
carry the same roles.  Unlike the reference, the node axis is optional in a
stronger sense: node parallelism is already free inside each chip (the
collocation axis is vmapped/batched), so ``n_node > 1`` only pays off when
the per-node spatial solve is large enough to keep several chips busy.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_time: int = 1, n_space: int = 1, n_node: int = 1, devices=None) -> Mesh:
    """Build a (time, node, space) mesh from the available devices.

    Axes of size 1 are kept in the mesh (named axes cost nothing), so all
    downstream sharding code can address 'time'/'node'/'space' uniformly.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_time * n_node * n_space
    if devices.size < need:
        raise ValueError(
            f'need {need} devices for mesh (time={n_time}, node={n_node}, '
            f'space={n_space}), have {devices.size}'
        )
    return Mesh(devices[:need].reshape(n_time, n_node, n_space),
                axis_names=('time', 'node', 'space'))


def block_sharding(mesh: Mesh, ndim_space: int, shard_space: bool = True,
                   node_axis_len: int | None = None) -> NamedSharding:
    """Sharding for block state arrays (P, M+1, *space): leading axis over
    'time', the collocation-node axis over 'node' (only when the mesh has a
    non-trivial node axis AND ``node_axis_len`` divides evenly — applying a
    sharding whose axis length does not divide fails at runtime), first
    spatial axis over 'space' (if requested)."""
    node = None
    if 'node' in mesh.axis_names and mesh.shape['node'] > 1:
        if node_axis_len is not None and node_axis_len % mesh.shape['node'] == 0:
            node = 'node'
    spec = ['time', node]
    space_axes = [None] * ndim_space
    if shard_space and ndim_space > 0:
        space_axes[0] = 'space'
    return NamedSharding(mesh, PartitionSpec(*spec, *space_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
