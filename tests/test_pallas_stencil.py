"""Pallas stencil kernel + sharded halo exchange (SURVEY P6/P7).

The Pallas kernel runs in interpret mode on the virtual CPU mesh (the real
compiled path is TPU-only); correctness is gated against the roll-based
reference apply.  The halo-exchange path runs under shard_map on the
8-device mesh and must match the unsharded result exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.ops.pallas.stencil import halo_stencil_apply, stencil2d_periodic


def _roll_reference(u, c0, cx, cy):
    return (
        c0 * u
        + cx * (jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0))
        + cy * (jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1))
    )


@pytest.mark.parametrize('shape', [(32, 128), (64, 256), (48, 128)])
def test_stencil2d_periodic_matches_rolls(shape):
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    c0, cx, cy = -4.0, 1.0, 1.5
    got = stencil2d_periodic(u, c0, cx, cy, interpret=True)
    want = _roll_reference(u, c0, cx, cy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_halo_stencil_matches_unsharded():
    from pysdc_tpu.parallel.mesh import make_mesh

    n_space = min(4, len(jax.devices()))
    mesh = make_mesh(n_time=1, n_space=n_space)
    # strip the size-1 time axis: halo_stencil_apply shards over 'space' only
    space_mesh = jax.sharding.Mesh(
        np.asarray(mesh.devices).reshape(-1), axis_names=('space',)
    )
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((8 * n_space, 32)))
    c0, cx, cy = -4.0, 1.0, 1.0
    got = halo_stencil_apply(u, space_mesh, c0, cx, cy, axis='space')
    want = _roll_reference(u, c0, cx, cy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12)


def test_halo_stencil_single_shard():
    space_mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), axis_names=('space',))
    u = jnp.asarray(np.linspace(0, 1, 16 * 8).reshape(16, 8))
    got = halo_stencil_apply(u, space_mesh, -2.0, 0.5, 0.5, axis='space')
    want = _roll_reference(u, -2.0, 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-12)
