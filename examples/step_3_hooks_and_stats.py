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


if __name__ == '__main__':
    main()
