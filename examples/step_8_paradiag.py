"""Step 8: ParaDiag — all-at-once diagonalization in time."""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ParaDiagController, get_sorted
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.sweepers.paradiag import QDiagonalization


def main():
    description = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=QDiagonalization,
        sweeper_params=dict(num_nodes=3, quad_type='RADAU-RIGHT'),
        level_params=dict(dt=0.05, restol=1e-10),
        step_params=dict(maxiter=20),
    )
    controller = ParaDiagController(8, {'logger_level': 30, 'alpha': 1e-4}, description)
    P = controller.template.levels[0].prob
    uend, stats = controller.run(P.u_exact(0.0), 0.0, 0.4)
    iters = [v for _, v in get_sorted(stats, type='niter')]
    err = float(jnp.max(jnp.abs(uend - P.u_exact(0.4))))
    print(f'ParaDiag over 8 steps: iterations={max(iters)}, err={err:.3e}')
    assert max(iters) <= 5
    assert err < 1e-6, err
    # alpha-circulant theory: looser alpha must not change the fixed point
    c2 = ParaDiagController(8, {'logger_level': 30, 'alpha': 1e-2}, description)
    u2, s2 = c2.run(P.u_exact(0.0), 0.0, 0.4)
    assert float(jnp.max(jnp.abs(uend - u2))) < 1e-9


if __name__ == '__main__':
    main()
