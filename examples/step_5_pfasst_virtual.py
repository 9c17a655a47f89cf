"""Step 5/6: virtual-parallel PFASST (reference tutorial/step_5 + step_6/A)."""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from pysdc_tpu import ControllerNonMPI, GenericImplicit, get_sorted
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
    results = {}
    for num_procs in (1, 2, 4, 8):
        controller = ControllerNonMPI(
            num_procs, {'logger_level': 30, 'all_to_done': True, 'predict_type': 'pfasst_burnin'}, description
        )
        P = controller.MS[0].levels[0].prob
        uend, stats = controller.run(P.u_exact(0.0), 0.0, 1.0)
        iters = [v for _, v in get_sorted(stats, type='niter')]
        err = float(jnp.max(jnp.abs(P.u_exact(1.0) - uend)))
        results[num_procs] = (iters, err, uend)
        print(f'procs={num_procs}: iterations={iters} err={err:.3e}')
        assert all(i <= 8 for i in iters)
        assert len(iters) == 8, 'dt=0.125 to Tend=1 is 8 steps'
        assert err < 1e-4, 'error must be at the spatial-discretization scale'
    # every block size lands on the same trajectory (restol-driven)
    for num_procs in (2, 4, 8):
        gap = float(jnp.max(jnp.abs(results[num_procs][2] - results[1][2])))
        assert gap < 1e-8, (num_procs, gap)
    # the PFASST trade-off: more time ranks never DECREASE total iterations
    totals = {n: sum(results[n][0]) for n in results}
    assert totals[8] >= totals[1], totals


if __name__ == '__main__':
    main()
