"""Step 1: collocation tables and a hand-rolled SDC iteration.

Mirrors reference tutorial/step_1 (spatial problem, collocation problem,
node-to-node SDC) on the TPU-native coefficient layer.
"""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

from pysdc_tpu.ops.collocation import get_collocation
from pysdc_tpu.ops.qdelta import qdelta_implicit
from pysdc_tpu.models.heat import HeatND


def main():
    prob = HeatND(nvars=63, nu=0.1, freq=4, bc='dirichlet-zero')
    coll = get_collocation(5, 'LEGENDRE', 'RADAU-RIGHT')
    QD = qdelta_implicit(coll, 'LU')[1:, 1:]
    dt = 0.1

    u0 = prob.u_exact(0.0)
    u = jnp.stack([u0] * coll.num_nodes)
    # preconditioned Picard iteration on the collocation problem
    for k in range(12):
        f = jax.vmap(lambda v: prob.eval_f(v, 0.0))(u)
        rhs = u0[None] + dt * jnp.tensordot(jnp.asarray(coll.q - QD), f, axes=(1, 0))
        for m in range(coll.num_nodes):
            acc = rhs[m]
            for j in range(m):
                acc = acc + dt * QD[m, j] * prob.eval_f(u[j], 0.0)
            u = u.at[m].set(prob.solve_system(acc, dt * QD[m, m], u[m], 0.0))
    res = jnp.max(jnp.abs(u0[None] + dt * jnp.tensordot(jnp.asarray(coll.q), jax.vmap(lambda v: prob.eval_f(v, 0.0))(u), axes=(1, 0)) - u))
    print(f'collocation residual after 12 sweeps: {float(res):.3e}')
    assert float(res) < 1e-8

    # collocation coefficient sanity (reference tutorial step_1/A gates):
    # weights integrate exactly, nodes ordered inside (0, 1], right end node
    assert abs(float(jnp.sum(jnp.asarray(coll.weights))) - 1.0) < 1e-13
    nodes = np.asarray(coll.nodes)
    assert np.all(np.diff(nodes) > 0) and nodes[0] > 0 and abs(nodes[-1] - 1.0) < 1e-13
    # Q row sums reproduce the node positions (integral of 1 from 0 to tau_m)
    assert np.allclose(np.asarray(coll.q).sum(axis=1), nodes, atol=1e-13)

    # every implicit preconditioner reaches the SAME collocation fixed point
    for flavor in ('IE', 'MIN-SR-S'):
        QD2 = qdelta_implicit(coll, flavor)[1:, 1:]
        u2 = jnp.stack([u0] * coll.num_nodes)
        for k in range(25):
            f2 = jax.vmap(lambda v: prob.eval_f(v, 0.0))(u2)
            rhs2 = u0[None] + dt * jnp.tensordot(jnp.asarray(coll.q - QD2), f2, axes=(1, 0))
            for m in range(coll.num_nodes):
                acc2 = rhs2[m]
                for j in range(m):
                    acc2 = acc2 + dt * QD2[m, j] * prob.eval_f(u2[j], 0.0)
                u2 = u2.at[m].set(prob.solve_system(acc2, dt * QD2[m, m], u2[m], 0.0))
        gap = float(jnp.max(jnp.abs(u2 - u)))
        print(f'{flavor}: fixed-point gap vs LU iterate {gap:.3e}')
        assert gap < 1e-8, flavor


if __name__ == '__main__':
    main()
