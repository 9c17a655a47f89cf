"""Soft-fault injection: flip bits in the solution during a run.

Counterpart of the reference Resilience project's ``FaultInjector``
(projects/Resilience/fault_injection.py:132-517): faults are specified (or
randomly drawn) as (time, level, iteration, node, position, bit) tuples; at
the matching hook point the chosen bit of the chosen solution entry is
flipped via an integer view of the float data.  Recovery strategies
(adaptivity-based restarts, Hot Rod detection, iterate-more) are exercised
in tests against injected faults.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.core.hooks import Hooks
from pysdc_tpu.core.state import LevelState


@dataclass
class Fault:
    """One bitflip event (reference fault_injection.py:24-130)."""

    time: float = None
    timestep: int = None
    level_number: int = 0
    iteration: int = 1
    node: int = 1
    problem_pos: tuple = (0,)
    bit: int = 0
    happened: bool = False

    @classmethod
    def random(cls, args, rng: np.random.Generator, num_nodes: int, shape: tuple, bits: int = 64):
        return cls(
            time=args.get('time'),
            timestep=args.get('timestep'),
            level_number=0,
            iteration=int(rng.integers(1, args.get('max_iter', 5) + 1)),
            node=int(rng.integers(1, num_nodes + 1)),
            problem_pos=tuple(int(rng.integers(0, s)) for s in shape),
            bit=int(rng.integers(0, bits)),
        )


def flip_bit(value: jnp.ndarray, bit: int) -> jnp.ndarray:
    """Flip one bit of a floating-point scalar via its integer view
    (reference fault_injection.py:452-517 uses struct pack/unpack)."""
    if value.dtype == jnp.float64:
        iview, bits = jnp.uint64, 64
    elif value.dtype == jnp.float32:
        iview, bits = jnp.uint32, 32
    else:
        raise NotImplementedError(f'bitflip not implemented for {value.dtype}')
    assert 0 <= bit < bits
    as_int = jax.lax.bitcast_convert_type(value, iview)
    flipped = as_int ^ np.asarray(1 << (bits - 1 - bit), dtype=iview)
    return jax.lax.bitcast_convert_type(flipped, value.dtype)


class FaultInjector(Hooks):
    """Hook that flips a bit of ``u`` at the configured hook point.

    Faults trigger at (timestep index OR time) + iteration, right after the
    sweep of the configured node's level.
    """

    def __init__(self):
        super().__init__()
        self.faults: list[Fault] = []
        self.rng = np.random.default_rng(0)
        self._step_counter = 0

    def add_fault(self, fault: Fault):
        self.faults.append(fault)

    def add_random_fault(self, time=None, timestep=None, num_nodes=3, shape=(1,), bits=64, max_iter=5):
        self.add_fault(
            Fault.random(
                dict(time=time, timestep=timestep, max_iter=max_iter),
                self.rng,
                num_nodes,
                shape,
                bits=bits,
            )
        )
        return self.faults[-1]

    def pre_step(self, step, level_number):
        super().pre_step(step, level_number)
        self._step_counter += 1

    def post_sweep(self, step, level_number):
        super().post_sweep(step, level_number)
        L = step.levels[level_number]
        for f in self.faults:
            if f.happened or level_number != f.level_number:
                continue
            time_match = (
                (f.time is not None and abs(float(L.time) - f.time) < 1e-13)
                or (f.timestep is not None and self._step_counter == f.timestep)
            )
            if time_match and step.status.iter == f.iteration:
                u = L.state.u
                idx = (f.node,) + f.problem_pos
                old = u[idx]
                new = flip_bit(old, f.bit)
                u_new = u.at[idx].set(new)
                # re-evaluate f at the corrupted node and refresh the
                # residual, else the fault heals silently (sweeps only read
                # old iterates through f) — reference fault_injection.py:286-297
                t_node = L.status.time + L.params.dt * L.sweep.coll.nodes[max(0, f.node - 1)]
                f_node = L.prob.eval_f(u_new[f.node], t_node)
                f_new = jax.tree_util.tree_map(
                    lambda leaf, comp: leaf.at[f.node].set(comp), L.state.f, f_node
                )
                L.state = LevelState(u=u_new, f=f_new, tau=L.state.tau)
                L.compute_residual()
                f.happened = True
                self.logger.info(
                    f'Flipped bit {f.bit} of u at node {f.node}, pos {f.problem_pos}: {old} -> {new}'
                )
                self.add_to_stats(
                    process=step.status.slot,
                    time=L.time,
                    level=level_number,
                    iter=step.status.iter,
                    sweep=L.status.sweep,
                    type='bitflip',
                    value=(f.node, f.problem_pos, f.bit),
                )

