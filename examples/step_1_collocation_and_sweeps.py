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


if __name__ == '__main__':
    main()
