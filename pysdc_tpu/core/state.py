"""State containers for the functional SDC core.

The reference keeps per-node solution/RHS values as Python lists of
ndarray-subclass objects (``pySDC/core/level.py:94-103``).  Here a level's
entire node data is a single pytree with a leading node axis — the layout
that lets XLA batch all collocation nodes in one program (node parallelism,
reference's P4, comes for free via vmap):

  - ``u``:   (M+1, *shape)   solution at [t0, node_1..node_M]
  - ``f``:   RHS pytree, each leaf (M+1, *shape); plain array for
             single-component problems, :class:`IMEX` for split problems,
             :class:`Comp2` for multi-implicit ones.
  - ``tau``: (M, *shape)     FAS correction (zeros when unused)

RHS containers mirror the reference's ``imex_mesh`` / ``comp2_mesh``
attribute views (``pySDC/implementations/datatype_classes/mesh.py:128-190``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class IMEX(NamedTuple):
    """Split RHS: ``impl`` (stiff, solved implicitly) + ``expl`` leaves."""

    impl: Any
    expl: Any


class Comp2(NamedTuple):
    """Two implicit components (multi-implicit sweeper)."""

    comp1: Any
    comp2: Any


class IMEXEXP(NamedTuple):
    """Three-way split RHS for exponential SDC (reference Monodomain
    project): ``impl`` stiff/implicit, ``expl`` nonstiff/explicit, ``exp``
    exponential Rush-Larsen terms f_exp(u) = lambda(u0) * (u - y_inf(u0))."""

    impl: Any
    expl: Any
    exp: Any


def f_total(f):
    """Full right-hand side: sum of all components."""
    leaves = jax.tree_util.tree_leaves(f)
    out = leaves[0]
    for leaf in leaves[1:]:
        out = out + leaf
    return out


def f_zeros_like(f):
    return jax.tree_util.tree_map(jnp.zeros_like, f)


class LevelState(NamedTuple):
    """All device data of one level of one time step (a pytree)."""

    u: jnp.ndarray  # (M+1, *shape)
    f: Any  # pytree, leaves (M+1, *shape)
    tau: jnp.ndarray  # (M, *shape)

    @property
    def u0(self):
        return self.u[0]

    @property
    def num_nodes(self):
        return self.u.shape[0] - 1


def norm_max(x) -> jnp.ndarray:
    """The datatype norm of the reference (``mesh.__abs__``,
    mesh.py:65-83): max absolute value over all components.  Under pjit on a
    sharded array XLA inserts the global reduction automatically."""
    leaves = jax.tree_util.tree_leaves(x)
    return jnp.max(jnp.stack([jnp.max(jnp.abs(leaf)) for leaf in leaves]))
