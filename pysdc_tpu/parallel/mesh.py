"""Device-mesh helpers for the (time, space) sharding of PFASST blocks.

The reference scales with nested MPI communicators
``[comm_time, comm_node, comm_space]`` (projects/GPU/configs/base_config.py:20-57);
the TPU-native equivalent is a single ``jax.sharding.Mesh`` whose axes carry
the same roles.  Collocation nodes never need a mesh axis here — node
parallelism is batched inside each chip (vmap), which the reference needs a
dedicated MPI communicator for.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_time: int = 1, n_space: int = 1, devices=None) -> Mesh:
    """Build a (time, space) mesh from the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_time * n_space
    if devices.size < need:
        raise ValueError(f'need {need} devices for mesh (time={n_time}, space={n_space}), have {devices.size}')
    return Mesh(devices[:need].reshape(n_time, n_space), axis_names=('time', 'space'))


def block_sharding(mesh: Mesh, ndim_space: int, shard_space: bool = True) -> NamedSharding:
    """Sharding for block state arrays (P, M+1, *space): leading axis over
    'time', first spatial axis over 'space' (if requested)."""
    spec = ['time', None]  # (P, nodes, ...)
    space_axes = [None] * ndim_space
    if shard_space and ndim_space > 0:
        space_axes[0] = 'space'
    return NamedSharding(mesh, PartitionSpec(*spec, *space_axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
