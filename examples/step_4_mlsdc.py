"""Step 4: multi-level SDC with FAS corrections (reference tutorial/step_4)."""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from pysdc_tpu import ControllerNonMPI, IMEXSweeper, get_sorted
from pysdc_tpu.models.heat import HeatNDForced


def main():
    description = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=4, nvars=[1023, 511], bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=[3, 3]),
        level_params=dict(restol=1e-10, dt=0.1),
        step_params=dict(maxiter=20),
        space_transfer_params=dict(rorder=2, iorder=6),
    )
    controller = ControllerNonMPI(1, {'logger_level': 30}, description)
    P = controller.MS[0].levels[0].prob
    uend, stats = controller.run(P.u_exact(0.1), 0.1, 0.3)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    err = float(jnp.max(jnp.abs(P.u_exact(0.3) - uend)))
    print(f'MLSDC iterations: {iters}, error: {err:.3e}')
    assert max(iters) <= 8 and err <= 2e-5

    # the point of the second level: fewer iterations than single-level SDC
    sdc = dict(description, problem_params=dict(description['problem_params'], nvars=1023),
               sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3))
    del sdc['space_transfer_params']
    c1 = ControllerNonMPI(1, {'logger_level': 30}, sdc)
    P1 = c1.MS[0].levels[0].prob
    _, s1 = c1.run(P1.u_exact(0.1), 0.1, 0.3)
    iters_sdc = [v for _, v in get_sorted(s1, type='niter')]
    print(f'single-level SDC iterations: {iters_sdc}')
    assert sum(iters) < sum(iters_sdc), (iters, iters_sdc)


if __name__ == '__main__':
    main()
