"""Step 7: adaptive step sizes + Hot Rod fault recovery
(reference tutorial/step_7 + Resilience project)."""
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

from pysdc_tpu import ControllerNonMPI, GenericImplicit, get_sorted
from pysdc_tpu.convergence.adaptivity import Adaptivity
from pysdc_tpu.convergence.hotrod import HotRod
from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.models.odes import VanDerPol
from pysdc_tpu.resilience.fault_injection import Fault, FaultInjector


def main():
    # adaptivity on Van der Pol
    desc = dict(
        problem_class=VanDerPol,
        problem_params=dict(mu=5.0, u0=(2.0, 0.0), newton_tol=1e-10),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=1e-2, restol=-1),
        step_params=dict(maxiter=4),
        convergence_controllers={Adaptivity: {'e_tol': 1e-7, 'dt_max': 0.1}},
    )
    c = ControllerNonMPI(1, {'logger_level': 30}, desc)
    P = c.MS[0].levels[0].prob
    _, stats = c.run(P.u_exact(0.0), 0.0, 2.0)
    dts = [v for _, v in get_sorted(stats, type='dt', recomputed=False)]
    print(f'adaptivity: {len(dts)} steps, dt in [{min(dts):.2e}, {max(dts):.2e}]')
    # decaying heat: the controller must stretch dt to its cap
    assert max(dts) >= 0.1 - 1e-12 and min(dts) < 0.05
    assert len(dts) < 2.0 / min(dts), 'adaptivity saved steps over uniform dt_min'

    # Hot Rod recovers from an injected bit flip
    injector = FaultInjector()
    injector.add_fault(Fault(timestep=6, iteration=3, node=3, problem_pos=(10,), bit=10))
    desc2 = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.1, restol=-1),
        step_params=dict(maxiter=5),
        convergence_controllers={HotRod: {'HotRod_tol': 1e-6}},
    )
    c2 = ControllerNonMPI(1, {'logger_level': 30}, desc2)
    c2.hooks.append(injector)
    P2 = c2.MS[0].levels[0].prob
    uend, stats2 = c2.run(P2.u_exact(0.0), 0.0, 1.0)
    err = float(jnp.max(jnp.abs(uend - P2.u_exact(1.0))))
    print(f'Hot Rod: fault happened={injector.faults[0].happened}, recovered error={err:.2e}')
    assert injector.faults[0].happened, 'the fault must actually have been injected'
    assert err < 1e-3


if __name__ == '__main__':
    main()
