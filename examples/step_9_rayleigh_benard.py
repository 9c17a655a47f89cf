"""Step 9: Rayleigh-Benard convection — the flagship spectral application."""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from pysdc_tpu import ControllerNonMPI, IMEXSweeper
from pysdc_tpu.models.rayleigh_benard import RayleighBenard


def main():
    description = dict(
        problem_class=RayleighBenard,
        problem_params=dict(nx=32, nz=16, Rayleigh=2e6, Prandtl=1.0),
        sweeper_class=IMEXSweeper,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.02, restol=-1),
        step_params=dict(maxiter=4),
    )
    controller = ControllerNonMPI(1, {'logger_level': 30}, description)
    P = controller.MS[0].levels[0].prob
    u0 = P.u_exact(0.0, noise_level=1e-3)
    print('Nu(t=0):', P.compute_Nusselt_numbers(u0))
    uend, _ = controller.run(u0, 0.0, 10.0)
    nus = P.compute_Nusselt_numbers(uend)
    print('Nu(t=10):', nus)
    assert nus['V'] > 1.5, 'convection should have set in'
    # during the transient the volume-averaged Nu leads the plate values,
    # but no Nusselt number may dip below the conduction floor of ~1
    assert nus['t'] > 0.9 and nus['b'] > 0.9, nus
    # top/bottom plates stay near-symmetric while the plumes develop
    assert abs(nus['t'] - nus['b']) < 0.5 * nus['V'], nus
    assert bool(jnp.isfinite(uend).all()), 'fields blew up'


if __name__ == '__main__':
    main()
