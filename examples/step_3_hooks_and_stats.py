"""Step 3: custom hooks and statistics (reference tutorial/step_3)."""
import jax
jax.config.update('jax_enable_x64', True)

from pysdc_tpu import ControllerNonMPI, GenericImplicit, get_sorted
from pysdc_tpu.core.hooks import Hooks
from pysdc_tpu.models.heat import HeatND


class LogMaxTemperature(Hooks):
    def post_step(self, step, level_number):
        super().post_step(step, level_number)
        L = step.levels[level_number]
        L.compute_end_point()
        import jax.numpy as jnp

        self.add_to_stats(
            process=step.status.slot, time=L.time, level=L.level_index,
            iter=step.status.iter, sweep=L.status.sweep,
            type='max_temperature', value=float(jnp.max(L.uend)),
        )


def main():
    description = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(restol=1e-10, dt=0.1),
        step_params=dict(maxiter=20),
    )
    controller = ControllerNonMPI(1, {'logger_level': 30, 'hook_class': [LogMaxTemperature]}, description)
    P = controller.MS[0].levels[0].prob
    _, stats = controller.run(P.u_exact(0.0), 0.0, 0.5)
    series = get_sorted(stats, type='max_temperature')
    print('max temperature over time:', [f'{v:.4f}' for _, v in series])
    assert all(series[i][1] >= series[i + 1][1] for i in range(len(series) - 1)), 'heat must decay'
    assert len(series) == 5, 'one custom entry per step expected'
    # the decay rate matches the analytic factor exp(-nu*(2*pi*freq)^2*dt)
    import numpy as np

    # decay factor of the DISCRETE mode sin(pi*freq*x) per dt=0.1
    dx = 1.0 / 64
    lam = -0.1 * (2.0 - 2.0 * np.cos(np.pi * 2 * dx)) / dx**2
    ratios = [series[i + 1][1] / series[i][1] for i in range(len(series) - 1)]
    assert np.allclose(ratios, np.exp(lam * 0.1), rtol=1e-6), ratios
    # default hooks also populated: niter + per-step timings alongside ours
    iters = [v for _, v in get_sorted(stats, type='niter')]
    assert len(iters) == 5 and all(1 <= v <= 20 for v in iters)
    assert len(get_sorted(stats, type='timing_step')) == 5


if __name__ == '__main__':
    main()
