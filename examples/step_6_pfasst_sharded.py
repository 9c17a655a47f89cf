"""Step 6: PFASST on a real device mesh — the sharded controller must
reproduce the virtual controller's iteration counts exactly
(reference tutorial/step_6/C + tests/test_tutorials/test_step_6)."""
import os

# run this example on the 8-device virtual CPU mesh unless real chips exist
os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
import jax

if len(jax.devices()) < 4:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from pysdc_tpu import ControllerNonMPI, GenericImplicit, ShardedController, get_sorted, make_mesh
from pysdc_tpu.models.heat import HeatND


def main():
    description = dict(
        problem_class=HeatND,
        problem_params=dict(nu=0.1, freq=2, nvars=[63, 31], bc='dirichlet-zero'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3], QI='LU'),
        level_params=dict(restol=5e-10, dt=0.125),
        step_params=dict(maxiter=50),
        space_transfer_params=dict(rorder=2, iorder=6),
    )
    cp = {'logger_level': 30, 'predict_type': 'pfasst_burnin'}

    virtual = ControllerNonMPI(4, cp, description)
    P = virtual.MS[0].levels[0].prob
    u_v, s_v = virtual.run(P.u_exact(0.0), 0.0, 1.0)
    it_v = [v for _, v in get_sorted(s_v, type='niter')]

    mesh = make_mesh(n_time=min(4, len(jax.devices())))
    sharded = ShardedController(4, cp, description, mesh=mesh)
    u_s, s_s = sharded.run(P.u_exact(0.0), 0.0, 1.0)
    it_s = [v for _, v in get_sorted(s_s, type='niter')]

    # the production fast lane: the whole block solve as ONE XLA program
    u_f, s_f = sharded.run_fused(P.u_exact(0.0), 0.0, 1.0)
    it_f = [v for _, v in get_sorted(s_f, type='niter')]

    print('virtual iterations:', it_v)
    print('sharded iterations:', it_s)
    print('fused iterations:  ', it_f)
    print('solution diff:', float(jnp.max(jnp.abs(u_v - u_s))))
    assert it_v == it_s == it_f
    assert float(jnp.max(jnp.abs(u_v - u_s))) < 1e-12
    assert float(jnp.max(jnp.abs(u_v - u_f))) < 1e-11


if __name__ == '__main__':
    main()
