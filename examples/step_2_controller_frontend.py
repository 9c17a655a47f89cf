"""Step 2: the controller frontend (reference tutorial/step_2/C)."""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from pysdc_tpu import ControllerNonMPI, IMEXSweeper, get_sorted
from pysdc_tpu.models.heat import HeatNDForced


def main():
    description = dict(
        problem_class=HeatNDForced,
        problem_params=dict(nu=0.1, freq=4, nvars=1023, bc='dirichlet-zero'),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(quad_type='RADAU-RIGHT', num_nodes=3),
        level_params=dict(restol=1e-10, dt=0.1),
        step_params=dict(maxiter=20),
    )
    controller = ControllerNonMPI(1, {'logger_level': 30}, description)
    P = controller.MS[0].levels[0].prob
    uend, stats = controller.run(P.u_exact(0.1), 0.1, 0.3)
    err = float(jnp.max(jnp.abs(P.u_exact(0.3) - uend)))
    iters = [v for _, v in get_sorted(stats, type='niter')]
    residuals = [v for _, v in get_sorted(stats, type='residual_post_step')]
    print('error after SDC iterations: %8.6e' % err)
    print('iterations per step:', iters)
    assert err <= 2e-5
    # line-by-line gates in the style of the reference tutorial tests
    # (tests/test_tutorials/test_step_2.py): every step terminates on the
    # residual tolerance, never the iteration cap
    assert all(r <= 1e-10 for r in residuals), residuals
    assert all(i < 20 for i in iters), iters
    assert len(iters) == 2


if __name__ == '__main__':
    main()
